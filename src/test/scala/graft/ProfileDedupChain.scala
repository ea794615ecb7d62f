package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling runner for the q78 dedup chain: times each stage of
  * minhash → LSH candidates → verify → star contraction → anti-join in
  * isolation (each materialized via noop, caches drained between), so
  * bench time can be attributed before optimizing. Usage:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "Test/runMain graft.ProfileDedupChain"`.
  */
object ProfileDedupChain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup (JIT/codegen/parquet footers)
    mat(SparkEntry.queries("q09_global_topk")(spark, dir))

    time("signatures")(mat(dedup.Dedup.minhashSignatures(spark, dir)))
    Caches.drain()
    val pairs = time("lsh pairs (sig+band+verify)") {
      val p = dedup.Dedup.minhashLshPairs(spark, dir)
        .select(col("id_a"), col("id_b")).cache()
      println(s"[profile]   n_pairs = ${p.count()}")
      p
    }
    Caches.drain() // sig cache; `pairs` stays (cached + counted above)
    time("star contraction")(mat(dedup.Dedup.starContractClusters(pairs)))
    Caches.drain()
    time("min-label (same pairs)")(mat(dedup.Dedup.minLabelClusters(pairs)))
    Caches.drain()
    pairs.unpersist()
    time("q78 end-to-end")(mat(SparkEntry.queries("q78_dedup_corpus_lsh")(spark, dir)))
    Caches.drain()
    time("q31 end-to-end")(mat(SparkEntry.queries("q31_minhash_lsh")(spark, dir)))
    Caches.drain()
    time("q77 end-to-end")(mat(SparkEntry.queries("q77_dedup_keeplist")(spark, dir)))
    Caches.drain()
    spark.stop()
  }
}
