package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Refresh-cost ∝ |delta| and query-speedup probe for the persisted
  * inverted text index (r17 — the AnnScaleProbe protocol applied to
  * [[graft.text.TextIndex]]). Run manually, results recorded in
  * PERF.md:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.TextIndexScaleProbe /root/testdata/sf0.1"
  *
  * Builds the postings over the full documents corpus once, compares
  * an indexed BM25 search against the from-scratch corpus pass, then
  * folds two MOR update deltas (~1% and ~9% of the docs) through
  * `refresh_text_index`, measuring wall time and asserting the
  * merge-on-read fold keeps every prior postings file AND that the
  * folded index still answers exactly like a recompute. */
object TextIndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      .config("spark.ui.enabled", "false")
      .appName("graft-text-index-scale-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val root = java.nio.file.Files.createTempDirectory("graft_tiscale").toString
      val base = s"$root/docs"
      spark.sql(s"CREATE TABLE graftcat.`$base` (doc_id BIGINT, text STRING) " +
        "USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      Tables.documents(spark, dir).select(col("doc_id"), col("text"))
        .writeTo(s"graftcat.`$base`").append()
      val n = spark.sql(s"SELECT count(*) FROM graftcat.`$base`").collect()(0).getLong(0)
      val t0 = System.nanoTime()
      spark.sql(s"CALL graftcat.create_text_index('$root/idx', '$base', 64)").collect()
      val buildSecs = (System.nanoTime() - t0) / 1e9

      def inline(): Seq[(Long, Double)] = {
        val toks = spark.sql(s"SELECT doc_id, text FROM graftcat.`$base`")
          .select(col("doc_id"), explode(regexp_extract_all(lower(col("text")),
            lit("[a-z0-9]+"), lit(0))).as("term"))
        val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val tf = toks.where(col("term").isin("hash", "join", "vector"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
        val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
          (col("df") + 0.5) + 1.0)
        val w = col("tf").cast("double") * lit(2.2) / (col("tf").cast("double") +
          lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
        tf.join(broadcast(df), "term").join(lens, "doc_id").crossJoin(broadcast(stats))
          .groupBy(col("doc_id")).agg(round(sum(idf * w), 6).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id")).limit(10)
          .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
      }
      def indexed(): Seq[(Long, Double)] =
        spark.sql(s"CALL graftcat.text_search('$root/idx', 'hash,join,vector', 10)")
          .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))

      val t1 = System.nanoTime()
      val viaIndex = indexed()
      val searchSecs = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val viaScan = inline()
      val scanSecs = (System.nanoTime() - t2) / 1e9
      assert(viaIndex == viaScan,
        s"indexed search must equal the corpus pass: $viaIndex vs $viaScan")

      val postings = graft.text.TextIndex.postingsPath(s"$root/idx")
      val json = new StringBuilder(
        f"""{"docs":$n,"buildSecs":$buildSecs%.2f,""" +
          f""""searchSecs":$searchSecs%.2f,"scanSecs":$scanSecs%.2f""")
      for ((mod, tag) <- Seq(97L -> "1pct", 11L -> "9pct")) {
        val before = graft.sources.JsonDocVersions.latest(postings).get._2
        val deltaDocs = spark.sql(
          s"SELECT count(*) FROM graftcat.`$base` WHERE doc_id % $mod = 1")
          .collect()(0).getLong(0)
        spark.sql(s"UPDATE graftcat.`$base` SET text = concat(text, ' vector') " +
          s"WHERE doc_id % $mod = 1")
        val t3 = System.nanoTime()
        spark.sql(s"CALL graftcat.refresh_text_index('$root/idx')").collect()
        val secs = (System.nanoTime() - t3) / 1e9
        val after = graft.sources.JsonDocVersions.latest(postings).get._2
        val kept = after.intersect(before).size
        assert(kept == before.size,
          s"[$tag] a MOR fold must keep every prior postings file " +
            s"(kept $kept of ${before.size})")
        assert(indexed() == inline(),
          s"[$tag] the folded index must answer exactly like a recompute")
        json.append(f""","$tag":{"deltaDocs":$deltaDocs,"refreshSecs":$secs%.2f,""" +
          f""""filesBefore":${before.size},"filesKept":$kept,""" +
          f""""filesAdded":${after.size - kept}}""")
        System.err.println(s"[text-scale] $tag delta=$deltaDocs secs=$secs " +
          s"kept=$kept/${before.size} added=${after.size - kept}")
      }
      json.append("}")
      println("ALL ASSERTIONS PASSED")
      println(json.toString)
    } finally spark.stop()
  }
}
