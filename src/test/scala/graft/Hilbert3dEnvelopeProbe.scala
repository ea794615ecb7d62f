package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md "d-dim layout"): per-file min/max extents of the
  * 3-D Hilbert layout vs the 2-D layout that never saw the third key —
  * the measured pruning surface a (custkey, day, price) predicate sees.
  *
  *   sbt "Test/runMain graft.Hilbert3dEnvelopeProbe"
  */
object Hilbert3dEnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val dayNum = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
      val src = Tables.orders(spark, "/root/testdata/sf0.1")
        .select(col("o_custkey").as("x"), dayNum.cast("long").as("y"),
          round(col("o_totalprice") * 100).cast("long").as("p"))
      def extents(df: org.apache.spark.sql.DataFrame): (Double, Double, Double, Int) = {
        val out = Files.createTempDirectory("graft_h3p").toFile.getAbsolutePath
        df.write.mode("overwrite").parquet(out)
        val rows = spark.read.parquet(out).groupBy(input_file_name())
          .agg((max(col("x")) - min(col("x"))).as("dx"),
            (max(col("y")) - min(col("y"))).as("dy"),
            (max(col("p")) - min(col("p"))).as("dp"))
          .collect()
        def mean(i: Int) = rows.map(_.getLong(i).toDouble).sum / rows.length
        (mean(1), mean(2), mean(3), rows.length)
      }
      val full = src.agg(max(col("x")) - min(col("x")),
        max(col("y")) - min(col("y")), max(col("p")) - min(col("p"))).head
      val n = 27
      val d3 = extents(ops.Layout.layoutHilbertD(src, Seq(col("x"), col("y"), col("p")), n))
      val z3 = extents(ops.Layout.layoutZOrderD(src, Seq(col("x"), col("y"), col("p")), n))
      val d2 = extents(ops.Layout.layoutHilbert(src, col("x"), col("y"), n))
      println(f"full ranges: x=${full.getLong(0)} y=${full.getLong(1)} p=${full.getLong(2)}")
      println(f"3-D hilbert (${d3._4} files): mean dx=${d3._1}%.0f dy=${d3._2}%.0f dp=${d3._3}%.0f")
      println(f"3-D morton  (${z3._4} files): mean dx=${z3._1}%.0f dy=${z3._2}%.0f dp=${z3._3}%.0f")
      println(f"2-D hilbert (${d2._4} files): mean dx=${d2._1}%.0f dy=${d2._2}%.0f dp=${d2._3}%.0f")

      // ---- 4-D (r12 — verdict item 7): the envelope comparison on 4
      // REAL clustering columns, (suppkey, ship-day, price, partkey)
      // over lineitem, so the "3-4 column" claim is measured in both
      // arities, not just bijection-tested. Metric: mean per-file
      // normalized envelope VOLUME Π(extent_i/range_i) — the fraction
      // of the 4-cube a file's min/max box covers, which is what a
      // 4-predicate range scan prunes against.
      val day4 = datediff(col("l_shipdate"), lit("1990-01-01").cast("date"))
      val src4 = Tables.lineitem(spark, "/root/testdata/sf0.1")
        .select(col("l_suppkey").as("k0"), day4.cast("long").as("k1"),
          round(col("l_extendedprice") * 100).cast("long").as("k2"),
          col("l_partkey").as("k3"))
      val keys4 = (0 until 4).map(i => col(s"k$i"))
      val f4 = src4.agg(
        (max(col("k0")) - min(col("k0"))).as("r0"), (max(col("k1")) - min(col("k1"))).as("r1"),
        (max(col("k2")) - min(col("k2"))).as("r2"), (max(col("k3")) - min(col("k3"))).as("r3")).head
      val ranges4 = (0 until 4).map(i => f4.getLong(i).toDouble)
      def vol4(df: org.apache.spark.sql.DataFrame): (Double, Int) = {
        val out = Files.createTempDirectory("graft_h4p").toFile.getAbsolutePath
        df.write.mode("overwrite").parquet(out)
        val rows = spark.read.parquet(out).groupBy(input_file_name())
          .agg(
            (max(col("k0")) - min(col("k0"))).as("d0"), (max(col("k1")) - min(col("k1"))).as("d1"),
            (max(col("k2")) - min(col("k2"))).as("d2"), (max(col("k3")) - min(col("k3"))).as("d3"))
          .collect()
        val vols = rows.map(r => (0 until 4).map(i => r.getLong(i + 1) / ranges4(i)).product)
        (vols.sum / vols.length, rows.length)
      }
      val h4 = vol4(ops.Layout.layoutHilbertD(src4, keys4, n))
      val m4 = vol4(ops.Layout.layoutZOrderD(src4, keys4, n))
      println(f"4-D hilbert (${h4._2} files): mean envelope volume ${h4._1}%.6f")
      println(f"4-D morton  (${m4._2} files): mean envelope volume ${m4._1}%.6f")
      println(f"4-D volume ratio hilbert/morton: ${h4._1 / m4._1}%.2f")
    } finally spark.stop()
  }
}
