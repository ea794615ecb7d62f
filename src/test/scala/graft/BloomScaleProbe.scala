package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r16): the per-file Bloom claim MEASURED — a point
  * lookup on an UNCLUSTERED high-cardinality key plans files-read ≪
  * live-files and pays proportionally less scan wall than the same
  * table without filters. Two identical tables (64 single-file commits
  * x 10k rows; every file spans the full key range via mod-64 keying,
  * so min/max prunes NOTHING), one with `write.bloom.columns = 'k'`:
  * the probe times point SELECTs and a point DELETE on both and prints
  * planned-file counts alongside wall seconds.
  *
  *   sbt "Test/runMain graft.BloomScaleProbe"
  */
object BloomScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_probe").toString

    val Files = 64
    val RowsPerFile = 10000
    def build(name: String, props: String): String = {
      val tbl = s"graftcat.`$root/$name`"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, payload STRING) " +
        s"USING `graft-jsondoc`$props")
      for (i <- 0 until Files) {
        // file i holds keys ≡ i (mod Files): every file's [min,max]
        // spans ~the whole domain — the stats pruner is blind here
        spark.range(RowsPerFile).select(
          (col("id") * Files + i).as("k"),
          concat(lit("payload-"), col("id")).as("payload"))
          .coalesce(1).writeTo(tbl).append()
      }
      tbl
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def planned(path: String, key: Long): Int = {
      val df = spark.read.format("graft-jsondoc").schema("k BIGINT, payload STRING")
        .option("path", path).load().filter(col("k") === key)
      df.collect()
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.inputPartitions.size
    }

    val (_, tBuildB) = time(build("bloomed", " TBLPROPERTIES ('write.bloom.columns' = 'k')"))
    val (_, tBuildC) = time(build("control", ""))
    println(f"build: bloomed $tBuildB%.1f s, control $tBuildC%.1f s " +
      f"(${Files * RowsPerFile} rows, $Files files each; write-side hashing overhead = the delta)")

    // warm both (JIT, file cache)
    spark.sql(s"SELECT count(*) FROM graftcat.`$root/bloomed`").collect()
    spark.sql(s"SELECT count(*) FROM graftcat.`$root/control`").collect()

    val keys = Seq(12345L, 333333L, 570007L)
    for (k <- keys) {
      val (pb, tb) = time(planned(s"$root/bloomed", k))
      val (pc, tc) = time(planned(s"$root/control", k))
      println(f"point SELECT k=$k%7d: bloomed planned $pb%3d of $Files files in $tb%.2f s; " +
        f"control planned $pc%3d in $tc%.2f s")
      assert(pb <= 4, s"bloom must prune to a handful of files, planned $pb")
      assert(pc == Files, s"control premise broken: planned $pc")
    }

    // point DELETE: group filtering narrows the rewrite by the bloom
    def liveCount(name: String): Int =
      graft.sources.JsonDocVersions.latest(s"$root/$name").map(_._2.size).getOrElse(-1)
    val beforeB = liveCount("bloomed")
    val (_, tDelB) = time(spark.sql(s"DELETE FROM graftcat.`$root/bloomed` WHERE k = 12345"))
    val (_, tDelC) = time(spark.sql(s"DELETE FROM graftcat.`$root/control` WHERE k = 12345"))
    println(f"point DELETE: bloomed $tDelB%.2f s (rewrote ${beforeB - liveCount("bloomed") + 1} file(s)), " +
      f"control $tDelC%.2f s")
    val sidecar = new java.io.File(s"$root/bloomed/_bloom.json").length()
    println(f"bloom sidecar: ${sidecar / 1024} KiB for ${Files * RowsPerFile} values " +
      f"(${sidecar.toDouble / (Files * RowsPerFile)}%.2f bytes/value)")
    println("ALL ASSERTIONS PASSED")
    spark.stop()
  }
}
