package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class UpsertEvent(k: Long, v: Double, op: String)

/** Dev probe (PERF.md r15): the streaming-upsert scale claim MEASURED —
  * per-epoch commit cost as the TABLE grows. Each epoch upserts a fixed
  * 500-key batch into a base that starts at 150k rows and keeps
  * growing; the equality-delete design means an epoch writes its rows +
  * one key-delete file and never scans the base (the MOR MERGE path
  * must, to locate row positions). FLAT epoch wall over 30 epochs is
  * the evidence; the probe also times the read-side fold debt before
  * and after OPTIMIZE repays it, and checks the final table exactly
  * against the last-wins expectation.
  *
  *   sbt "Test/runMain graft.UpsertScaleProbe"
  */
object UpsertScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_upsert_probe").toString
    val path = s"$root/t"
    try {
      spark.conf.set("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      spark.sql(s"CREATE TABLE graftcat.`$path` (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
      val baseN = 150000L
      spark.range(baseN).select(col("id").as("k"), (col("id") * 1.5).as("v"))
        .repartition(50) // 50 base files: a realistic small-files table
        .writeTo(s"graftcat.`$path`").append()
      val mem = MemoryStream[UpsertEvent]
      val q = mem.toDF().writeStream.format("graft-jsondoc")
        .option("path", path)
        .option("checkpointLocation", s"$root/ckpt")
        .option("upsert-keys", "k").option("upsert-cdc-col", "op")
        .start()
      val epochs = 30
      val epochRows = 500
      val walls = new Array[Double](epochs)
      try {
        for (e <- 0 until epochs) {
          // each epoch touches a sliding 500-key window: updates into
          // the base range plus inserts above it, a realistic CDC mix
          val batch = (0 until epochRows).map { i =>
            val key = (e.toLong * 137 + i * 193) % (baseN + 20000)
            UpsertEvent(key, e * 1000.0 + i, if (i % 10 == 9) "D" else "U")
          }
          val t0 = System.nanoTime()
          mem.addData(batch: _*)
          q.processAllAvailable()
          walls(e) = (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val head = walls.slice(1, 11).sum / 10 // skip epoch 0 (stream warmup)
      val tail = walls.takeRight(10).sum / 10
      println(f"  epoch walls: first10(after warmup)=$head%.3f s avg, last10=$tail%.3f s avg")
      assert(tail <= head * 2.5 + 0.5,
        f"per-epoch upsert cost must stay FLAT as the table grows: " +
          f"first10=$head%.3f s vs last10=$tail%.3f s")
      // read-side: the fold debt, then OPTIMIZE repays it
      def timeRead(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = spark.sql(s"SELECT count(*) AS n, sum(v) AS s FROM graftcat.`$path`")
          .collect()(0).getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (readBefore, nBefore) = timeRead()
      val eqsBefore = graft.sources.JsonDocVersions.eqsFor(path, None)._1.length
      val v = graft.sources.GraftCatalog.optimize(path, targetBytes = 32L * 1024 * 1024)
      val (readAfter, nAfter) = timeRead()
      println(f"  read: pre-purge $readBefore%.2f s ($eqsBefore eq sets), " +
        f"post-purge $readAfter%.2f s (optimize v=$v)")
      assert(nBefore == nAfter, s"OPTIMIZE changed the answer: $nBefore -> $nAfter")
      assert(graft.sources.JsonDocVersions.eqsFor(path, None)._1.isEmpty,
        "optimize must purge every folded eq set")
      // exactness: rebuild last-wins state in plain Spark and compare counts
      val events = (0 until epochs).flatMap { e =>
        (0 until epochRows).map { i =>
          val key = (e.toLong * 137 + i * 193) % (baseN + 20000)
          (e * epochRows + i, key, e * 1000.0 + i, if (i % 10 == 9) "D" else "U")
        }
      }.toDF("seq", "k", "v", "op")
      import org.apache.spark.sql.expressions.Window
      val lastOp = events
        .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
      val base = spark.range(baseN).select(col("id").as("k"), (col("id") * 1.5).as("v"))
      val touched = events.select("k").distinct()
      val expected = base.join(touched, Seq("k"), "left_anti")
        .unionByName(lastOp.filter(col("op") =!= "D").select("k", "v"))
      val expN = expected.count()
      assert(nAfter == expN, s"final table rows $nAfter != last-wins expectation $expN")
      println(s"  exact: $nAfter rows == last-wins expectation")
      val out = f"""{"metric":"upsert_probe","epochs":$epochs,"epoch_rows":$epochRows,""" +
        f""""first10_s":$head%.3f,"last10_s":$tail%.3f,"read_pre_purge_s":$readBefore%.2f,""" +
        f""""read_post_purge_s":$readAfter%.2f,"rows":$nAfter}"""
      println("UPSERT PROBE PASSED")
      println(out)
    } finally {
      spark.stop()
      // best-effort scratch cleanup
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }
}
