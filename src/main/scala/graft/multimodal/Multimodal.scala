package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** A media payload: opaque bytes + typed metadata. At scale this is how
  * image/audio/video travel through the pipeline — binary column plus a
  * small metadata struct, decoded only inside partition-local batches. */
case class MediaRecord(doc_id: Long, media: Array[Byte], mime: String)

case class DecodedMedia(width: Int, height: Int, channels: Int)

case class MediaFeature(doc_id: Long, n_bytes: Long, width: Long, height: Long)

/** Multimodal-column plumbing (SURVEY.md §2B extensions): media as opaque
  * BinaryType columns, decode/feature-extract as partition-local typed
  * transforms (`Dataset.mapPartitions` — the Scala analogue of mapInPandas
  * batch UDFs: one decoder instantiation per partition, rows streamed
  * through it).
  *
  * The actual codec is a STUB — this container has no image/audio libs —
  * but it is a *deterministic* stub, so the surrounding plumbing (schema,
  * binary encoding, partitioning, batch shape) is real and oracle-checked:
  * the DuckDB oracle recomputes the same deterministic features from the
  * source column.
  */
object Multimodal {

  /** STUB codec: stands in for an image decoder (???-equivalent). Emits
    * deterministic pseudo-dimensions derived from the payload length so
    * the pipeline around it is verifiable end-to-end. */
  object FakeCodec {
    def decode(bytes: Array[Byte]): DecodedMedia =
      DecodedMedia(
        width = (bytes.length % 64) + 1,
        height = (bytes.length % 48) + 1,
        channels = 3)
  }

  /** documents.text re-encoded as a binary media column — the stand-in
    * corpus for image bytes (schema shape is what matters). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"))

  /** Decode + feature-extract over the binary column, partition-local. */
  def q36MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ds = mediaTable(spark, dir).as[MediaRecord]
    ds.mapPartitions { it =>
      // one codec per partition — mirrors per-batch decoder init cost
      val codec = FakeCodec
      it.map { r =>
        val d = codec.decode(r.media)
        MediaFeature(r.doc_id, r.media.length.toLong, d.width.toLong, d.height.toLong)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  // strlen() in DuckDB is byte length, matching Array[Byte].length on
  // UTF-8 encoded text.
  val q36Sql: String =
    "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, " +
      "CAST(strlen(text) % 64 + 1 AS BIGINT) AS width, " +
      "CAST(strlen(text) % 48 + 1 AS BIGINT) AS height " +
      "FROM documents ORDER BY doc_id"

  /** Frame sampling over the binary payload: fixed 64-byte frames at a
    * 128-byte stride (every other frame — the video-keyframe pattern),
    * plus a content hash of the first frame. Partition-local like q36:
    * this is the shape of a real decode (frames never leave the
    * executor; only small per-frame features do). */
  def q50FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val frameLen = 64
    val stride = 128
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val n = r.media.length
        val frames = if (n >= frameLen) ((n - frameLen) / stride) + 1L else 0L
        // digest input is the lowercase-hex encoding of the frame bytes,
        // not the raw bytes: DuckDB (the oracle) cannot slice or md5 a
        // BLOB, but hex(encode(text)) makes the same byte content
        // expressible there — and char-based substr(text,...) would
        // diverge the moment a multibyte char straddles the boundary
        val firstMd5 = if (frames > 0) {
          md.reset()
          val hexFrame = java.util.Arrays.copyOfRange(r.media, 0, frameLen)
            .map("%02x".format(_)).mkString
          md.digest(hexFrame.getBytes("UTF-8")).map("%02x".format(_)).mkString
        } else null
        (r.doc_id, frames, firstMd5)
      }
    }.toDF("doc_id", "n_frames", "first_frame_md5").orderBy(col("doc_id"))
  }

  val q50Sql: String =
    "SELECT doc_id, " +
      "CAST(CASE WHEN strlen(text) >= 64 THEN floor((strlen(text) - 64) / 128) + 1 ELSE 0 END AS BIGINT) AS n_frames, " +
      "CASE WHEN strlen(text) >= 64 THEN md5(lower(substr(hex(encode(text)), 1, 128))) END AS first_frame_md5 " +
      "FROM documents ORDER BY doc_id"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_media_features" -> q36MediaFeatures _,
    "q50_frame_sample" -> q50FrameSample _
  )

  val oracle: Map[String, String] = Map(
    "q36_media_features" -> q36Sql,
    "q50_frame_sample" -> q50Sql
  )
}
