package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what runtime (DPP-style) filtering actually buys the
  * jsondoc scan: the same selective join run with dynamic partition
  * pruning ON (runtime In filter reaches the line reader, non-joining
  * lines dropped at parse time) vs OFF (every line parsed and shipped
  * to the join). Result equality is asserted both ways — this is a
  * measurement harness, not a correctness gate (SourceSinkSpec and
  * JsonDocOffsetSpec own those pins). Numbers go to PERF.md.
  *
  * Run: sbt "Test/runMain graft.RuntimeFilterProbe"
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("runtime-filter-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // 4M documents (~250 MB JSON) across 8 response files, ~60 bytes/line, written
    // through the V2 writer so the _stats.json sidecar exists and file
    // skipping can participate (each file owns a contiguous id range)
    val dir = java.nio.file.Files.createTempDirectory("graft_rtf_probe").toString
    val nDocs = 4000000
    spark.range(nDocs).select(
      col("id").as("doc_id"), lit("en").as("lang"),
      (lit(100) + col("id") % 900).as("n_chars"))
      .repartitionByRange(8, col("doc_id"))
      .write.format("graft-jsondoc").option("path", dir).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_chars", org.apache.spark.sql.types.LongType)))

    // two dim shapes, both selecting ~1% of keys, both parquet so the
    // selective filter survives optimization (a LocalRelation folds it
    // away and DPP never fires):
    //  - SCATTERED: every 100th key -> hits every file, so only the
    //    row-level In drop can help (parse cost is identical either way)
    //  - CLUSTERED: 4000 consecutive keys inside ONE file's range -> the
    //    stats sidecar lets the runtime filter skip 7 of 8 files
    val scatPath = java.nio.file.Files.createTempDirectory("graft_rtf_dim1").toString
    (0L until nDocs.toLong).map(i => (i, if (i % 100 == 0) "keep" else "drop"))
      .toDF("doc_id", "cat").write.mode("overwrite").parquet(scatPath)
    val clusPath = java.nio.file.Files.createTempDirectory("graft_rtf_dim2").toString
    (0L until nDocs.toLong).map(i => (i, if (i >= 100000 && i < 140000) "keep" else "drop"))
      .toDF("doc_id", "cat").write.mode("overwrite").parquet(clusPath)

    def run(dimPath: String, want: Long, dppEnabled: Boolean): Double = {
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", dppEnabled)
      val src = spark.read.format("graft-jsondoc").schema(schema)
        .option("path", dir).load()
      val dim = spark.read.parquet(dimPath).filter(col("cat") === "keep")
      val t0 = System.nanoTime()
      val n = src.join(dim, "doc_id").agg(count(lit(1)), sum(col("n_chars")))
        .collect().head.getLong(0)
      assert(n == want, s"result diverged: got=$n want=$want (dpp=$dppEnabled)")
      (System.nanoTime() - t0) / 1e9
    }

    run(scatPath, nDocs / 100, dppEnabled = true) // warm JIT + page cache
    def median(dimPath: String, want: Long): (Double, Double) = {
      val rounds = (1 to 3).map { _ =>
        (run(dimPath, want, dppEnabled = false), run(dimPath, want, dppEnabled = true))
      }
      (rounds.map(_._1).sorted.apply(1), rounds.map(_._2).sorted.apply(1))
    }
    val (scOff, scOn) = median(scatPath, nDocs / 100)
    val (clOff, clOn) = median(clusPath, 40000L)
    println(f"RUNTIME_FILTER_PROBE docs=$nDocs files=8 " +
      f"scattered_off=${scOff}%.2fs scattered_on=${scOn}%.2fs ratio=${scOff / scOn}%.2f | " +
      f"clustered_off=${clOff}%.2fs clustered_on=${clOn}%.2fs ratio=${clOff / clOn}%.2f")
    println("ALL ASSERTIONS PASSED")
    spark.stop()
  }
}
