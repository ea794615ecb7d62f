package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r12): where q125's wall clock goes, stage by
  * stage — shingles, exploded hashes, df, prefix window, candidate
  * self-join, verify, finale.
  *
  *   sbt "Test/runMain graft.PrefixJoinProfileProbe"
  */
object PrefixJoinProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    try {
      import org.apache.spark.sql.expressions.Window
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[q125] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      // untimed warmup of the full query
      dedup.Dedup.q125PrefixJoin(spark, dir).collect()
      spark.catalog.clearCache()
      val sh = dedup.Dedup.shingles(spark, dir).cache()
      t("shingles")(println("  rows=" + sh.count()))
      val e = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
        .select(col("doc_id"), xxhash64(col("s")).as("s")).cache()
      t("exploded hashes")(println("  rows=" + e.count()))
      val sizes = sh.select(col("doc_id"), size(col("shingles")).cast("long").as("n"))
      val df = e.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val pref = t("prefix window") {
        val p = e.join(df, "s")
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
          .join(sizes, "doc_id")
          .where(col("rk") <= floor(col("n") / 2) + 1)
          .select(col("doc_id"), col("s"), col("n")).cache()
        println("  rows=" + p.count())
        p
      }
      val cands = t("candidate self-join") {
        val c = pref.as("a").join(pref.as("b"),
            col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
              col("a.n") * 2 >= col("b.n") && col("b.n") * 2 >= col("a.n"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct().cache()
        println("  rows=" + c.count())
        c
      }
      t("verify (exploded hash-join)") {
        val inter = cands.join(e.as("ea"), col("id_a") === col("ea.doc_id"))
          .select(col("id_a"), col("id_b"), col("ea.s").as("s")).as("pa")
          .join(e.as("eb"), col("pa.id_b") === col("eb.doc_id") && col("pa.s") === col("eb.s"))
          .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
        val out = inter
          .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
          .withColumn("jac", col("inter").cast("double") /
            (col("sa.n") + col("sb.n") - col("inter")).cast("double"))
          .where(col("jac") >= 0.5)
        println("  pairs=" + out.count())
      }
      t("verify (sorted-array walk)") {
        graft.functions.IntersectFunctions.register(spark)
        val adj = e.groupBy(col("doc_id")).agg(sort_array(collect_list(col("s"))).as("toks"))
        val out = cands
          .join(adj.select(col("doc_id").as("id_a"), col("toks").as("ta")), Seq("id_a"))
          .join(adj.select(col("doc_id").as("id_b"), col("toks").as("tb")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            graft.functions.IntersectFunctions.sortedIntersectCount(col("ta"), col("tb")).as("inter"),
            (size(col("ta")) + size(col("tb"))).cast("long").as("tot"))
          .withColumn("jac", col("inter").cast("double") /
            (col("tot") - col("inter")).cast("double"))
          .where(col("jac") >= 0.5)
        println("  pairs=" + out.count())
      }
    } finally spark.stop()
  }
}
