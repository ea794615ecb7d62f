package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout features that carry the read side at scale: hive-style
  * partitioned writes must produce partition PRUNING on read (the
  * predicate removes directories before any file is opened — at 100 TB
  * the difference between scanning 1/5 of the data and all of it). */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("partitionBy write → partition-pruned read") {
    val out = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Tables.documents(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)

    val read = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = read.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
    // the lang predicate must be a PartitionFilter (directory-level), not
    // a data filter evaluated per row
    assert(scan.metadata("PartitionFilters").contains("lang"),
      scan.metadata("PartitionFilters"))
    assert(!scan.metadata.getOrElse("PushedFilters", "").contains("lang"))
    // pruning must actually reduce the files read (numFiles metric is
    // populated by execution; inputFiles on the DataFrame is pre-pruning)
    val want = Tables.documents(spark, dir).filter(col("lang") === "en").count()
    assert(read.count() == want)
    val executedScan = read.queryExecution.executedPlan.collectLeaves().collect {
      case f: FileSourceScanExec => f
    }.head
    val prunedFiles = executedScan.metrics("numFiles").value
    val totalFiles = spark.read.parquet(out).inputFiles.length
    assert(prunedFiles < totalFiles, s"read $prunedFiles of $totalFiles files")
  }

  test("stream-static broadcast enrichment join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.Ev]
    mem.addData(
      graft.streaming.Ev(1, 10, "view", new java.sql.Timestamp(0), 1.0),
      graft.streaming.Ev(2, 11, "view", new java.sql.Timestamp(1), 2.0))
    val dim = Seq((10L, "gold"), (12L, "silver")).toDF("dim_user_id", "tier")
    val q = graft.streaming.Streaming.enrichEvents(mem.toDF(), dim)
      .writeStream.format("memory").queryName("enriched").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("enriched").select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows == Map(1L -> "gold", 2L -> null)) // left join keeps unmatched
  }
}
