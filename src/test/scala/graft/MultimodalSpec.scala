package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{DecodedMedia, Multimodal}

/** The codec seam: the multimodal queries take any `MediaCodec`, so a
  * real decoder drops in without touching query code. The stub stays the
  * default (its outputs are what the DuckDB oracle verifies); this spec
  * proves an injected alternative actually flows through the
  * mapPartitions plumbing to the result. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** A deliberately different (still deterministic) codec. */
  private object AltCodec extends Multimodal.MediaCodec {
    def decode(bytes: Array[Byte]): DecodedMedia =
      DecodedMedia(width = 7, height = 9, channels = 1)
    def resize(bytes: Array[Byte], target: Int): Array[Byte] =
      bytes.take(math.min(3, target))
  }

  test("default codec is the stub — results match the oracle-checked shape") {
    val rows = Multimodal.q36MediaFeatures(spark, dir).limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_bytes")
      assert(r.getAs[Long]("width") == (n % 64) + 1)
      assert(r.getAs[Long]("height") == (n % 48) + 1)
    }
  }

  test("an injected codec flows through decode (q36) without query changes") {
    val rows = Multimodal.q36MediaFeatures(spark, dir, AltCodec).limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("width") == 7L)
      assert(r.getAs[Long]("height") == 9L)
    }
  }

  test("an injected codec flows through resize (q67) without query changes") {
    val rows = Multimodal.q67MediaResize(spark, dir, AltCodec)
      .filter(col("out_len") > 0).limit(10).collect()
    assert(rows.nonEmpty)
    // AltCodec caps output at 3 bytes; the stub would emit up to 256
    rows.foreach(r => assert(r.getAs[Long]("out_len") <= 3L))
  }
}
