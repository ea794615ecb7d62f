package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r11): where q129's wall clock goes, stage by
  * stage — edge build, orientation, wedge join, closing join.
  *
  *   sbt "Test/runMain graft.TriangleProfileProbe"
  */
object TriangleProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    try {
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[tri] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      val small = items.groupBy(col("ok")).agg(count(lit(1)).as("bs"))
        .filter(col("bs") <= 40).select(col("ok"))
      val inCap = items.join(small, "ok").cache()
      t("items+cap")(println("  rows=" + inCap.count()))
      val edges = inCap.select(col("ok"), col("pk").as("u"))
        .join(inCap.select(col("ok"), col("pk").as("v")), Seq("ok"))
        .filter(col("u") < col("v"))
        .select(col("u"), col("v")).distinct().cache()
      t("edges")(println("  rows=" + edges.count()))
      val deg = edges.select(col("u").as("node")).union(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d")).cache()
      t("degrees")(println("  rows=" + deg.count()))
      val before = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
      val oriented = edges
        .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
        .select(
          when(before, col("u")).otherwise(col("v")).as("src"),
          when(before, col("v")).otherwise(col("u")).as("dst"),
          when(before, col("dv")).otherwise(col("du")).as("dd")).cache()
      t("orient")(println("  rows=" + oriented.count()))
      val wedges = oriented.select(col("src"), col("dst").as("v"), col("dd").as("ddv"))
        .join(oriented.select(col("src"), col("dst").as("w"), col("dd").as("ddw")), Seq("src"))
        .filter(col("ddv") < col("ddw") || (col("ddv") === col("ddw") && col("v") < col("w")))
      t("wedges")(println("  rows=" + wedges.count()))
      val tri = wedges.join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      t("close")(println("  rows=" + tri.count()))
      // ---- bloom-literal prefilter experiment ----
      val mBits = 1L << 24
      val k = 2
      def pairHash(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        xxhash64(a, b)
      val dense = t("bloom build") {
        val rows = oriented
          .select(pairHash(col("src"), col("dst")).as("h"))
          .withColumn("_i", explode(sequence(lit(0), lit(k - 1))))
          .withColumn("_pos", pmod(xxhash64(col("_i"), col("h")), lit(mBits)))
          .groupBy((col("_pos") / 64).cast("long").as("block"))
          .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))")).as("bits"))
          .collect()
        val arr = new Array[Long]((mBits / 64).toInt)
        rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
        arr.toSeq
      }
      val bloomLit = typedLit(dense)
      val wh = pairHash(col("v"), col("w"))
      val hit = (0 until k).map { i =>
        val pos = pmod(xxhash64(lit(i), wh), lit(mBits))
        call_function("shiftright", element_at(bloomLit, (pos / 64).cast("int") + 1),
          pmod(pos, lit(64)).cast("int")).bitwiseAND(lit(1L)) =!= 0
      }.reduce(_ && _)
      val tri2 = wedges.filter(hit)
        .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
      t("close+bloom")(println("  rows=" + tri2.count()))
      val surv = t("bloom survivors")(wedges.filter(hit).count())
      println(s"  survivors=$surv of 41M")
    } finally spark.stop()
  }
}
