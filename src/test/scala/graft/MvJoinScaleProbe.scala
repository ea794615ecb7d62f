package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Refresh-cost ∝ |delta| probe for JOIN-body materialized views (r17
  * — the AnnScaleProbe protocol applied to [[graft.sources.GraftMv]]'s
  * two-term fold). Run manually, results recorded in PERF.md:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.MvJoinScaleProbe /root/testdata/sf0.1"
  *
  * Builds the revenue-by-segment join view over sf0.1 orders (150k) ⋈
  * customer (15k), then folds a-side deltas (~1% and ~9% of orders as
  * MOR updates) and one b-side delta (a segment migration touching 20%
  * of customers — every affected customer's orders re-sign through
  * A@head ⋈ ΔB). Asserts after every fold: view == from-scratch
  * recompute, and the merge-on-read backing kept every prior file. */
object MvJoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      // the probe's ground truth must recompute from the bases
      .config("spark.graft.mv.rewrite.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .appName("graft-mv-join-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_mvjscale").toString
      spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
      spark.sql("CREATE NAMESPACE graftcat.db")
      val o = s"graftcat.`$root/o`"
      val c = s"graftcat.`$root/c`"
      spark.sql(s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, " +
        "cents BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"CREATE TABLE $c (c_custkey BIGINT, c_mktsegment STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .writeTo(o).append()
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
        .writeTo(c).append()
      val nO = spark.sql(s"SELECT count(*) FROM $o").collect()(0).getLong(0)
      val nC = spark.sql(s"SELECT count(*) FROM $c").collect()(0).getLong(0)
      val body = s"SELECT c_mktsegment, count(*) AS n, sum(cents) AS s " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey GROUP BY c_mktsegment"
      val t0 = System.nanoTime()
      spark.sql(s"CREATE MATERIALIZED VIEW graftcat.db.m AS $body")
      val buildSecs = (System.nanoTime() - t0) / 1e9
      val backing = s"$root/wh/db/m.mvdata"

      def check(tag: String): Unit = {
        val got = spark.sql("SELECT * FROM graftcat.db.m").collect()
          .map(_.toSeq).sortBy(_.mkString("|")).toSeq
        val want = spark.sql(body).collect()
          .map(_.toSeq).sortBy(_.mkString("|")).toSeq
        require(got == want, s"[$tag] fold must equal the recompute")
      }
      check("fill")
      val json = new StringBuilder(
        f"""{"orders":$nO,"customers":$nC,"buildSecs":$buildSecs%.2f""")
      def fold(tag: String, dml: => Unit): Unit = {
        val before = graft.sources.JsonDocVersions.latest(backing).get._2
        dml
        val t1 = System.nanoTime()
        spark.sql("CALL graftcat.refresh_mv('db.m')").collect()
        val secs = (System.nanoTime() - t1) / 1e9
        val after = graft.sources.JsonDocVersions.latest(backing).get._2
        require(after.intersect(before).size == before.size,
          s"[$tag] a MOR fold must keep every prior backing file")
        check(tag)
        json.append(f""","$tag":$secs%.2f""")
        System.err.println(s"[mvjoin-scale] $tag secs=$secs")
      }
      fold("a1pct", spark.sql(
        s"UPDATE $o SET cents = cents + 1 WHERE o_orderkey % 97 = 1"): Unit)
      fold("a9pct", spark.sql(
        s"UPDATE $o SET cents = cents + 1 WHERE o_orderkey % 11 = 1"): Unit)
      fold("b20pct", spark.sql(
        s"UPDATE $c SET c_mktsegment = 'GRAFT' WHERE c_custkey % 5 = 1"): Unit)
      json.append("}")
      println("ALL ASSERTIONS PASSED")
      println(json.toString)
    } finally spark.stop()
  }
}
