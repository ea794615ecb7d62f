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
  * Two codecs sit behind the injection seam: [[Multimodal.ImageIOCodec]]
  * is a REAL image decoder/resizer on the JDK's `javax.imageio` (spec'd
  * on real PNG bytes), and [[Multimodal.FakeCodec]] is a *deterministic*
  * stub that stays the driver-facing default so the surrounding plumbing
  * (schema, binary encoding, partitioning, batch shape) is oracle-checked:
  * the DuckDB oracle recomputes the same deterministic features from the
  * source column (it cannot decode images).
  */
object Multimodal {

  /** The codec seam: a real decoder (javax.imageio, ffmpeg bindings, …)
    * drops in by implementing this trait and passing it to the query
    * functions — no query code changes. Must be Serializable: instances
    * ship inside the mapPartitions closures to executors. */
  trait MediaCodec extends Serializable {
    def decode(bytes: Array[Byte]): DecodedMedia
    def resize(bytes: Array[Byte], target: Int = 256): Array[Byte]
  }

  /** REAL image codec backed by `javax.imageio` (JDK java.desktop — zero
    * extra dependencies): decodes PNG/BMP/GIF/JPEG bytes to true
    * width/height/channels, and resizes by drawing onto a scaled
    * canvas (longest side <= target, aspect preserved) re-encoded as
    * PNG. Drop-in for any query taking a `MediaCodec`; `FakeCodec`
    * stays the default so driver-facing outputs remain derivable by the
    * DuckDB oracle (which cannot decode images). MultimodalSpec runs the
    * q36 pipeline with this codec over real in-test PNG bytes. */
  object ImageIOCodec extends MediaCodec {
    private def read(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      // ImageIO's default stream cache spools to executor-local temp
      // FILES per decode — pure churn when the payload is already an
      // in-memory byte array. MemoryCacheImageInputStream keeps the
      // whole decode off disk without touching the process-global
      // ImageIO.setUseCache flag.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read closes the stream itself; the guard only covers the
      // no-registered-reader path (where it stays open)
      val img = try javax.imageio.ImageIO.read(in)
      finally try in.close() catch { case _: java.io.IOException => () }
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      img
    }

    def decode(bytes: Array[Byte]): DecodedMedia = {
      val img = read(bytes)
      DecodedMedia(img.getWidth, img.getHeight, img.getRaster.getNumBands)
    }

    def resize(bytes: Array[Byte], target: Int): Array[Byte] = {
      val img = read(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      val scale = math.min(1.0, target.toDouble / math.max(w, h))
      val (nw, nh) = (math.max(1, math.round(w * scale).toInt), math.max(1, math.round(h * scale).toInt))
      // keep the alpha channel when the source has one — drawing RGBA
      // onto an opaque canvas would silently composite transparency
      // onto black and drop the channel from the re-encoded PNG
      val outType =
        if (img.getColorModel.hasAlpha) java.awt.image.BufferedImage.TYPE_4BYTE_ABGR
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val out = new java.awt.image.BufferedImage(nw, nh, outType)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", baos)
      baos.toByteArray
    }
  }

  /** STUB codec (the default): emits deterministic pseudo-dimensions
    * derived from the payload length so the pipeline around it is
    * verifiable end-to-end by the DuckDB oracle, which can recompute
    * length-derived features but cannot decode an image. For real image
    * payloads use [[ImageIOCodec]]. */
  object FakeCodec extends MediaCodec {
    def decode(bytes: Array[Byte]): DecodedMedia =
      DecodedMedia(
        width = (bytes.length % 64) + 1,
        height = (bytes.length % 48) + 1,
        channels = 3)

    /** STUB resize: strided byte-sampling down to <= `target` bytes —
      * stands in for an image downscale. Deterministic so the output
      * payload itself is oracle-checkable (via its hex md5). */
    def resize(bytes: Array[Byte], target: Int): Array[Byte] = {
      val n = bytes.length
      if (n == 0) bytes
      else {
        val m = math.min(n, target)
        val stride = math.max(1, n / target)
        Array.tabulate(m)(i => bytes(i * stride))
      }
    }
  }

  /** documents.text re-encoded as a binary media column — the stand-in
    * corpus for image bytes (schema shape is what matters). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"))

  /** Decode + feature-extract over any media Dataset, partition-local —
    * the operator itself, independent of which table feeds it and which
    * codec decodes it (q36 below binds the documents-derived table +
    * default codec; MultimodalSpec binds real PNG bytes + ImageIOCodec). */
  def mediaFeatures(ds: org.apache.spark.sql.Dataset[MediaRecord],
      codec: MediaCodec): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // one codec reference per partition — mirrors per-batch decoder init
      it.map { r =>
        val d = codec.decode(r.media)
        MediaFeature(r.doc_id, r.media.length.toLong, d.width.toLong, d.height.toLong)
      }
    }.toDF().orderBy(col("doc_id"))
  }

  /** Decode + feature-extract over the binary column, partition-local.
    * `codec` is the injection seam (default: the labeled stub). */
  def q36MediaFeatures(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    mediaFeatures(mediaTable(spark, dir).as[MediaRecord], codec)
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
      // JDK HexFormat: bulk, allocation-light lowercase hex — a
      // per-byte "%02x".format builds a Formatter PER BYTE, which is
      // the kind of constant-factor waste that owns a 100 TB scan
      val hex = java.util.HexFormat.of()
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
          val hexFrame = hex.formatHex(r.media, 0, frameLen)
          hex.formatHex(md.digest(hexFrame.getBytes("UTF-8")))
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

  /** Resize over the binary column — the remaining multimodal verb
    * (decode=q36, frame-sample=q50, resize=here). Same shape as a real
    * image downscale stage: binary in, smaller binary out, only the
    * payload's digest + size leave the executor for the check. The
    * resized BYTES themselves are oracle-verified (DuckDB recomputes the
    * strided sample from the hex encoding), not just their count. */
  def q67MediaResize(spark: SparkSession, dir: String,
      codec: MediaCodec = FakeCodec): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = java.util.HexFormat.of() // see q50: bulk lowercase hex
      it.map { r =>
        val out = codec.resize(r.media, 256)
        md.reset()
        val hexOut = hex.formatHex(out)
        (r.doc_id, out.length.toLong,
          hex.formatHex(md.digest(hexOut.getBytes("UTF-8"))))
      }
    }.toDF("doc_id", "out_len", "resize_md5").orderBy(col("doc_id"))
  }

  // An empty payload must still yield a row (out_len 0, md5 of the empty
  // string) to match the Spark side — unnest(range(0,0)) would otherwise
  // drop the doc from samp, so b LEFT JOINs back and coalesces.
  val q67Sql: String =
    "WITH b AS (SELECT doc_id, lower(hex(encode(text))) AS hx, strlen(text) AS n FROM documents), " +
      "par AS (SELECT doc_id, hx, n, greatest(1, n // 256) AS stride, least(n, 256) AS m FROM b), " +
      "idx AS (SELECT doc_id, hx, stride, m, unnest(range(0, m)) AS i FROM par), " +
      "samp AS (SELECT doc_id, string_agg(substr(hx, CAST(i*stride*2+1 AS BIGINT), 2), '' ORDER BY i) AS shx, " +
      "any_value(m) AS m FROM idx GROUP BY doc_id) " +
      "SELECT b.doc_id, CAST(coalesce(samp.m, 0) AS BIGINT) AS out_len, " +
      "coalesce(md5(samp.shx), md5('')) AS resize_md5 " +
      "FROM b LEFT JOIN samp ON b.doc_id = samp.doc_id ORDER BY b.doc_id"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_media_features" -> ((s, d) => q36MediaFeatures(s, d)),
    "q50_frame_sample" -> q50FrameSample _,
    "q67_media_resize" -> ((s, d) => q67MediaResize(s, d))
  )

  val oracle: Map[String, String] = Map(
    "q36_media_features" -> q36Sql,
    "q50_frame_sample" -> q50Sql,
    "q67_media_resize" -> q67Sql
  )
}
