package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r11): where q31's wall goes — shingling,
  * signatures (the K interpreted HOF folds), banding, candidate join,
  * exact verify.
  *
  *   sbt "Test/runMain graft.MinhashProfileProbe"
  */
object MinhashProfileProbe {
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
        println(f"[mh] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val sh = dedup.Dedup.shingles(spark, dir).cache()
      t("shingles")(println("  rows=" + sh.count()))
      val sig = dedup.Dedup.minhashSignaturesOf(sh).cache()
      t("signatures")(println("  rows=" + sig.count()))
      val banded = dedup.Dedup.bandsOf(sig).cache()
      t("bands")(println("  rows=" + banded.count()))
      val cands = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct().cache()
      t("cand join")(println("  rows=" + cands.count()))
      val full = t("q31 end-to-end")(dedup.Dedup.q31MinhashLsh(spark, dir).count())
      println("  pairs=" + full)
    } finally spark.stop()
  }
}
