package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stale-serving cost probe (r17 — evidence for the O(delta) claim):
  * build a materialized view over the sf0.1 orders corpus, leave it
  * UNREFRESHED through deepening DML lineages, and measure the user
  * query at staleness 0 / 8 / 32 commits against the full base
  * recompute. Run manually, results recorded in PERF.md:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.MvStaleProbe /root/testdata/sf0.1"
  *
  * Asserts at every depth: the served answer equals the recompute
  * (rule disabled) byte-for-byte, and the plan reads the backing +
  * feed, never an unpinned base scan. */
object MvStaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .appName("graft-mv-stale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_mvstale").toString
      spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
      spark.sql("CREATE NAMESPACE graftcat.db")
      val path = new java.io.File(s"$root/t").getAbsolutePath
      val tbl = s"graftcat.`$path`"
      spark.sql(s"CREATE TABLE $tbl (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .writeTo(tbl).append()
      val n = spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0)
      spark.sql("CREATE MATERIALIZED VIEW graftcat.db.rev AS " +
        s"SELECT o_custkey, count(*) AS c, sum(cents) AS s FROM $tbl " +
        "GROUP BY o_custkey")
      val q = s"SELECT o_custkey, count(*) AS c, sum(cents) AS s FROM $tbl " +
        "GROUP BY o_custkey"

      def served(expectFeed: Boolean): (Double, Long) = {
        val t0 = System.nanoTime()
        val df = spark.sql(q)
        var feed = false; var unpinnedBase = false; var backing = false
        df.queryExecution.analyzed.foreach {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
            if (r.table.getClass.getSimpleName.contains("Changes")) feed = true
            val n = r.table.name()
            if (n.contains(".mvdata")) backing = true
            // an UNPINNED base scan renders without the @v suffix
            else if (n == s"graft-jsondoc($path)") unpinnedBase = true
          case _ =>
        }
        require(backing && !unpinnedBase && feed == expectFeed,
          s"plan shape: backing=$backing unpinnedBase=$unpinnedBase " +
            s"feed=$feed expectFeed=$expectFeed")
        val rows = df.collect()
        ((System.nanoTime() - t0) / 1e9, rows.length.toLong)
      }
      def recompute(): Double = {
        spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
        try {
          val t0 = System.nanoTime()
          spark.sql(q).collect()
          (System.nanoTime() - t0) / 1e9
        } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
      }
      def equalBoth(): Unit = {
        val on = spark.sql(q).collect().map(_.toSeq).sortBy(_.mkString("|"))
        spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
        val off = try spark.sql(q).collect().map(_.toSeq).sortBy(_.mkString("|"))
          finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
        require(on.toSeq == off.toSeq, "stale serving changed the answer")
      }

      val (t0s, _) = served(expectFeed = false)
      val base0 = recompute()
      val json = new StringBuilder(
        f"""{"rows":$n,"current":{"served":$t0s%.2f,"recompute":$base0%.2f}""")
      var staleness = 0
      for (depth <- Seq(8, 32)) {
        while (staleness < depth) {
          spark.sql(s"UPDATE $tbl SET cents = cents + 1 " +
            s"WHERE o_orderkey % 997 = $staleness")
          staleness += 1
        }
        equalBoth()
        val (ts, _) = served(expectFeed = true)
        val tr = recompute()
        json.append(f""","stale$depth":{"served":$ts%.2f,"recompute":$tr%.2f}""")
        System.err.println(s"[mv-stale] depth=$depth served=$ts recompute=$tr")
      }
      spark.sql("CALL graftcat.refresh_mv('db.rev')").collect()
      val (tAfter, _) = served(expectFeed = false)
      json.append(f""","refreshed":{"served":$tAfter%.2f}}""")
      println("ALL ASSERTIONS PASSED")
      println(json.toString)
    } finally spark.stop()
  }
}
