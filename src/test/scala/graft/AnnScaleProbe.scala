package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Refresh-cost ∝ |delta| probe for the persisted ANN index (r17,
  * verdict item 2's "probe showing refresh cost ∝ |delta|"). Run
  * manually, results recorded in PERF.md:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.AnnScaleProbe /root/testdata/sf0.1"
  *
  * Builds the IVF index over the full embeddings corpus once, then
  * folds two MOR update deltas (~1% and ~10% of the corpus) through
  * `refresh`, measuring wall time and the postings files rewritten by
  * each MERGE. The claim under test: fold cost tracks the DELTA (feed
  * rows + matched postings files), never the index — the build itself
  * is the only corpus-sized step. */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.ui.enabled", "false")
      .appName("graft-ann-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_annscale").toString
      val base = s"$root/base"
      spark.sql(s"CREATE TABLE graftcat.`$base` (vec_id BIGINT, vec STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      val full = sim.Similarity.vectors(spark, dir).select(col("vec_id"),
        concat_ws(",", transform(col("v"), x => x.cast("string"))).as("vec"))
      full.writeTo(s"graftcat.`$base`").append()
      val n = full.count()
      val t0 = System.nanoTime()
      spark.sql(s"CALL graftcat.create_ann('$root/idx', '$base', 8)").collect()
      val buildSecs = (System.nanoTime() - t0) / 1e9
      val postings = sim.AnnIndex.postingsPath(s"$root/idx")
      val json = new StringBuilder(
        f"""{"corpus":$n,"buildSecs":$buildSecs%.2f""")
      for ((mod, tag) <- Seq(97L -> "1pct", 11L -> "9pct")) {
        val before = graft.sources.JsonDocVersions.latest(postings).get._2
        val deltaRows = spark.sql(
          s"SELECT count(*) FROM graftcat.`$base` WHERE vec_id % $mod = 1")
          .collect()(0).getLong(0)
        spark.sql(s"UPDATE graftcat.`$base` SET vec = vec WHERE vec_id % $mod = 1")
        val t1 = System.nanoTime()
        spark.sql(s"CALL graftcat.refresh_ann('$root/idx')").collect()
        val secs = (System.nanoTime() - t1) / 1e9
        val after = graft.sources.JsonDocVersions.latest(postings).get._2
        val kept = after.intersect(before).size
        val cnt = spark.sql(s"SELECT count(*) FROM graftcat.`$postings`")
          .collect()(0).getLong(0)
        assert(cnt == n, s"[$tag] fold must keep the corpus complete: $cnt vs $n")
        // MERGE-ON-READ postings: the fold rewrites NOTHING — deltas
        // land as delete vectors + insert files, O(changed rows)
        assert(kept == before.size,
          s"[$tag] a MOR fold must keep every prior postings file " +
            s"(kept $kept of ${before.size})")
        json.append(f""","$tag":{"deltaRows":$deltaRows,"refreshSecs":$secs%.2f,""" +
          f""""filesBefore":${before.size},"filesKept":$kept,""" +
          f""""filesAdded":${after.size - kept}}""")
        System.err.println(s"[ann-scale] $tag delta=$deltaRows secs=$secs " +
          s"kept=$kept/${before.size} added=${after.size - kept}")
      }
      json.append("}")
      println("ALL ASSERTIONS PASSED")
      println(json.toString)
    } finally spark.stop()
  }
}
