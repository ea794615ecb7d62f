package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.StreamingBoard

/** Pins what the q146-q148 oracle hashes can't see: that the
  * materialized streaming rows really executed MULTIPLE micro-batches
  * (so the hash-green output is evidence of cross-batch state carry and
  * of timers fired by watermark advancement, not of a single-batch
  * degenerate run). Batch count is read from the checkpoint's offsets
  * log — one offset file per started micro-batch, the engine's own
  * source of truth. Result equality vs the batch twins is the DuckDB
  * oracle's job at sf0.01; here it is re-asserted at sf0.001 so the
  * file-delivery protocol (mod-time ordering + maxFilesPerTrigger=1) is
  * covered by `sbt test` as well. */
class StreamingBoardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-board-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  /** Completed micro-batch count = offset log entries (files named by
    * batch id under ckpt/offsets). */
  private def nBatches(root: String): Int =
    new java.io.File(s"$root/ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))

  test("q146 runs the quota cap across >=2 micro-batches and equals the batch window") {
    val root = java.nio.file.Files.createTempDirectory("graft_q146spec").toString
    val got = StreamingBoard.q146Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(nBatches(root) >= 2, "quota stream must span micro-batches")
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.flatMap(_.sortBy(_._1).take(10).zipWithIndex
        .map { case ((id, s), i) => (id, s, i + 1L) }).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q148 fires every day-close timer (4 delivered files) and equals batch q118") {
    val root = java.nio.file.Files.createTempDirectory("graft_q148spec").toString
    val got = StreamingBoard.q148Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getDouble(2), r.getInt(3))).toSet
    assert(nBatches(root) >= 4, "two data + two sentinel batches expected")
    val expect = ops.TimeSeries.q118GapFill(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getDouble(2), r.getInt(3))).toSet
    assert(got === expect,
      s"stream/batch diverge: ${got.diff(expect).take(3)} vs ${expect.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q150 closes every session via timers (4 delivered files) and keeps micro precision") {
    val root = java.nio.file.Files.createTempDirectory("graft_q150spec").toString
    val got = StreamingBoard.q150Impl(spark, sf, root).collect()
    assert(nBatches(root) >= 4, "two data + two sentinel batches expected")
    assert(got.nonEmpty)
    // micros survive the state round-trip: the events table has
    // sub-millisecond timestamps, so some session bound must carry a
    // non-zero micro remainder (the q150 oracle failed on exactly this)
    val micros = got.map(_.getAs[java.time.LocalDateTime]("start").getNano / 1000 % 1000)
    assert(micros.exists(_ != 0), "all session starts ms-aligned — micros truncated again?")
    // every event lands in exactly one session
    val nEvents = got.map(_.getAs[Long]("n_events")).sum
    val expected = Tables.events(spark, sf).count()
    assert(nEvents == expected, s"$nEvents session events vs $expected input events")
  }
}
