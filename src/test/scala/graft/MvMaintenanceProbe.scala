package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r12): q183's scale claim measured — per-epoch
  * MERGE cost as the maintained view GROWS. Epochs cycle through four
  * disjoint user-id quarters, so each MERGE matches only the files
  * holding its quarter; the file-granular runtime group filter should
  * keep the per-epoch rewrite set (and wall) bounded while the table's
  * total live file count climbs — O(delta), not O(view).
  *
  *   sbt "Test/runMain graft.MvMaintenanceProbe"
  */
object MvMaintenanceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val root = java.nio.file.Files.createTempDirectory("graft_mvprobe").toString
    try {
      spark.conf.set("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      val path = s"$root/mv"
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT, " +
        "first_us BIGINT, last_us BIGINT, max_value DOUBLE) USING `graft-jsondoc`")
      val ev = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .cache()
      println("  feed rows=" + ev.count())
      val quarters = 4; val epochs = 16
      for (i <- 0 until epochs) {
        val q = i % quarters
        val slice = ev
          .filter(pmod(col("user_id"), lit(quarters)) === q)
          .filter(pmod(col("event_id"), lit(epochs / quarters)) === i / quarters)
          .drop("event_id")
        def sidecarKeys(): Seq[String] = {
          val sc = new java.io.File(path, "_stats.json")
          if (!sc.isFile) Seq("<absent>") else
            "\"([^\"]+\\.jsonl)\"".r.findAllMatchIn(
              java.nio.file.Files.readString(sc.toPath)).map(_.group(1)).toSeq.sorted
        }
        if (sys.env.contains("MV_PROBE_DUMP")) {
          println(s"    pre-apply stats keys: " + sidecarKeys().mkString(", "))
          val sc = new java.io.File(path, "_stats.json")
          if (sc.isFile) {
            val raw = java.nio.file.Files.readString(sc.toPath)
            println(s"    pre-apply raw len=${raw.length} braces=${raw.count(_ == '{')}/" +
              s"${raw.count(_ == '}')} startsWith=${raw.take(20)} endsWith=${raw.takeRight(20)}")
          }
        }
        val t0 = System.nanoTime()
        graft.streaming.StreamingBoard.q183Apply(tbl, path, i.toLong, slice)
        val dt = (System.nanoTime() - t0) / 1e9
        val h = spark.sql(
          s"SELECT version, n_files, n_rows FROM graftcat.`$path#history` " +
            "ORDER BY version DESC LIMIT 1").head
        val nRows = if (h.isNullAt(2)) "?" else h.getLong(2).toString
        println(f"[mv] epoch $i%2d (quarter $q): $dt%5.2f s  " +
          f"view: v${h.getLong(0)} files=${h.getLong(1)} rows=$nRows")
        if (i <= 4 && sys.env.contains("MV_PROBE_DUMP")) {
          val live = new java.io.File(path).listFiles()
            .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
            .map(_.getName).sorted
          println("    files on disk: " + live.mkString(", "))
          val sc = new java.io.File(path, "_stats.json")
          val keys = if (!sc.isFile) Seq("<absent>") else
            "\"([^\"]+\\.jsonl)\"".r.findAllMatchIn(
              java.nio.file.Files.readString(sc.toPath)).map(_.group(1)).toSeq.sorted
          println("    stats keys:    " + keys.mkString(", "))
          println("    live missing stats: " +
            live.filterNot(keys.contains(_)).mkString(", "))
        }
      }
      // the maintained view must equal the one-shot recomputation
      val got = spark.sql(s"SELECT * FROM $tbl").count()
      val want = ev.select(col("user_id")).distinct().count()
      println(s"  view rows=$got distinct users=$want " +
        (if (got == want) "MATCH" else "MISMATCH"))
    } finally {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    }
  }
}
