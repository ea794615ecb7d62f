package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Refresh-cost ∝ |delta| probe for N-TABLE join materialized views
  * (r18 — the MvJoinScaleProbe protocol applied to
  * [[graft.sources.GraftMv.refreshJoinN]]'s telescoped fold). Run
  * manually, results recorded in PERF.md:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.Mv3JoinScaleProbe /root/testdata/sf0.1"
  *
  * Builds the revenue-by-nation view over sf0.1
  * orders (150k) ⋈ customer (15k) ⋈ nation (25), then folds:
  * a ~1% and a ~9% orders update (the side-0 term joins the delta
  * against customer@old ⋈ nation@old), a 20% customer
  * nation-migration (the side-1 term re-signs every affected
  * customer's orders through orders@head ⋈ Δc ⋈ nation@old), a
  * nation rename (a side-2 delta of a handful of rows re-signing
  * whole groups), and one range where ALL THREE sides move. Asserts
  * after every fold: view == from-scratch 3-way recompute, and the
  * merge-on-read backing kept every prior file. */
object Mv3JoinScaleProbe {
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
      .appName("graft-mv-3join-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_mv3jscale").toString
      spark.conf.set("spark.sql.catalog.graftcat.warehouse", s"$root/wh")
      spark.sql("CREATE NAMESPACE graftcat.db")
      val o = s"graftcat.`$root/o`"
      val c = s"graftcat.`$root/c`"
      val n = s"graftcat.`$root/n`"
      Seq(
        s"CREATE TABLE $o (o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT) " +
          "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')",
        s"CREATE TABLE $c (c_custkey BIGINT, c_nationkey BIGINT) " +
          "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')",
        s"CREATE TABLE $n (n_nationkey BIGINT, n_name STRING) " +
          "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')"
      ).foreach(spark.sql(_))
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .writeTo(o).append()
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
        .writeTo(c).append()
      Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
        .writeTo(n).append()
      val nO = spark.sql(s"SELECT count(*) FROM $o").collect()(0).getLong(0)
      val body = s"SELECT n_name, count(*) AS cnt, sum(cents) AS s " +
        s"FROM $o JOIN $c ON o_custkey = c_custkey " +
        s"JOIN $n ON c_nationkey = n_nationkey GROUP BY n_name"
      val t0 = System.nanoTime()
      spark.sql(s"CREATE MATERIALIZED VIEW graftcat.db.m3 AS $body")
      val buildSecs = (System.nanoTime() - t0) / 1e9
      val backing = s"$root/wh/db/m3.mvdata"

      def check(tag: String): Unit = {
        val got = spark.sql("SELECT * FROM graftcat.db.m3").collect()
          .map(_.toSeq).sortBy(_.mkString("|")).toSeq
        val want = spark.sql(body).collect()
          .map(_.toSeq).sortBy(_.mkString("|")).toSeq
        require(got == want, s"[$tag] fold must equal the 3-way recompute")
      }
      check("fill")
      val json = new StringBuilder(
        f"""{"orders":$nO,"buildSecs":$buildSecs%.2f""")
      def fold(tag: String, dml: => Unit): Unit = {
        val before = graft.sources.JsonDocVersions.latest(backing).get._2
        dml
        val t1 = System.nanoTime()
        spark.sql("CALL graftcat.refresh_mv('db.m3')").collect()
        val secs = (System.nanoTime() - t1) / 1e9
        val after = graft.sources.JsonDocVersions.latest(backing).get._2
        require(after.intersect(before).size == before.size,
          s"[$tag] a MOR fold must keep every prior backing file")
        check(tag)
        json.append(f""","$tag":$secs%.2f""")
        System.err.println(s"[mv3join-scale] $tag secs=$secs")
      }
      fold("a1pct", spark.sql(
        s"UPDATE $o SET cents = cents + 1 WHERE o_orderkey % 97 = 1"): Unit)
      fold("a9pct", spark.sql(
        s"UPDATE $o SET cents = cents + 1 WHERE o_orderkey % 11 = 1"): Unit)
      fold("b20pct", spark.sql(
        s"UPDATE $c SET c_nationkey = (c_nationkey + 1) % 25 " +
          "WHERE c_custkey % 5 = 1"): Unit)
      fold("cRename", spark.sql(
        s"UPDATE $n SET n_name = concat('x_', n_name) " +
          "WHERE n_nationkey % 5 = 0"): Unit)
      fold("all3", {
        spark.sql(s"UPDATE $o SET cents = cents + 1 WHERE o_orderkey % 101 = 1")
        spark.sql(s"UPDATE $c SET c_nationkey = (c_nationkey + 2) % 25 " +
          "WHERE c_custkey % 50 = 1")
        spark.sql(s"INSERT INTO $n VALUES (99, 'zz_new')"): Unit
      })
      json.append("}")
      println("ALL ASSERTIONS PASSED")
      println(json.toString)
    } finally spark.stop()
  }
}
