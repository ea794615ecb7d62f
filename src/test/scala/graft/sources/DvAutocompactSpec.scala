package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** DV-DEBT AUTO-COMPACTION (r18, [[JsonDocAutocompactDv]] — verdict
  * item 7): continuous MV/index refresh lands every fold as delete
  * vectors + small inserts on a merge-on-read table; without
  * repayment the read-side fold chain grows without bound. With
  * `write.autocompact.dvs` set (the derived-data tables opt in at
  * CREATE), a row-level commit that leaves >= N live delete vectors
  * OPTIMIZEs the affected partition subtrees inline. Pins: across many
  * refresh folds the LIVE DV count stays bounded (vs. strictly growing
  * without the hook), the history shows the op=optimize repayment
  * commits, and search over the compacted postings is byte-identical
  * to the from-scratch recompute — compaction is invisible in the
  * answers. */
class DvAutocompactSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .appName("dv-autocompact-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cat = "graftcat"

  test("N index folds keep live DVs bounded; history shows repayment; search exact") {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_dvac").toString
    val tbl = s"$cat.`$root/docs`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val rows = (0L until 40L).map(i =>
      s"($i, '${words(i.toInt % 5)} ${words((i.toInt + 1) % 5)} word$i')")
    spark.sql(s"INSERT INTO $tbl VALUES ${rows.mkString(", ")}")
    spark.sql(s"CALL $cat.create_text_index('$root/idx', '$root/docs', 4)")
      .collect()
    val postings = graft.text.TextIndex.postingsPath(s"$root/idx")
    // the spec-sized threshold (CREATE's default is 32)
    spark.sql(s"ALTER TABLE $cat.`$postings` SET TBLPROPERTIES " +
      "('write.autocompact.dvs' = '6', " +
      s"'write.autocompact.target-bytes' = '${4 * 1024 * 1024}')")

    var maxDvs = 0
    (1 to 12).foreach { i =>
      // each round rewrites four docs' texts (tf/dl change -> postings
      // MERGE lands DVs on matched rows) and inserts a fresh doc
      spark.sql(s"UPDATE $tbl SET text = concat(text, ' extra$i') " +
        s"WHERE doc_id % 10 = ${i % 10} AND doc_id < 40")
      spark.sql(s"INSERT INTO $tbl VALUES (${100 + i}, 'alpha beta fresh$i')")
      spark.sql(s"CALL $cat.refresh_text_index('$root/idx')").collect()
      val live = JsonDocVersions.latestVersion(postings)
        .map(v => JsonDocVersions.readDvs(postings, v).size).getOrElse(0)
      maxDvs = math.max(maxDvs, live)
    }
    // bounded: the threshold plus one fold's worth of fresh DVs — far
    // below the strictly-growing no-repayment trajectory
    assert(maxDvs <= 12,
      s"DV debt must stay bounded under continuous refresh, peaked at $maxDvs")
    val hist = spark.sql(
      s"SELECT op FROM $cat.`$postings#history` WHERE op = 'optimize'").count()
    assert(hist >= 1, "the history must show the repayment commits")

    // compaction is invisible: search equals the from-scratch BM25
    val got = graft.text.TextIndex.search(spark, cat, s"$root/idx",
      Seq("alpha", "beta"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val toks = spark.sql(s"SELECT doc_id, text FROM $tbl")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin("alpha", "beta"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val w = col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    val want = tf.join(broadcast(dfq), "term").join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id")).agg(round(sum(idf * w), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want,
      "search over compacted postings must equal the from-scratch recompute")
  }

  test("MV backing folds repay DV debt the same way") {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    val wh = java.nio.file.Files.createTempDirectory("graft_dvac_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE NAMESPACE $cat.dvac")
      val root = java.nio.file.Files.createTempDirectory("graft_dvac_mv").toString
      val base = s"$cat.`$root/t`"
      spark.sql(s"CREATE TABLE $base (k BIGINT, g STRING, x BIGINT) " +
        "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
      spark.sql(s"INSERT INTO $base SELECT id, concat('g', id % 8), id " +
        "FROM range(0, 200)")
      val body = s"SELECT g, count(*) AS n, sum(x) AS s FROM $base GROUP BY g"
      spark.sql(s"CREATE MATERIALIZED VIEW $cat.dvac.m AS $body")
      val backing = s"$wh/dvac/m.mvdata"
      spark.sql(s"ALTER TABLE $cat.`$backing` SET TBLPROPERTIES " +
        "('write.autocompact.dvs' = '4')")
      var maxDvs = 0
      (1 to 10).foreach { i =>
        // every fold UPDATEs most groups' states -> DVs on the backing
        spark.sql(s"INSERT INTO $base SELECT id + ${1000 * i}, " +
          s"concat('g', id % 8), id FROM range(0, 16)")
        spark.sql(s"CALL $cat.refresh_mv('dvac.m')").collect()
        val live = JsonDocVersions.latestVersion(backing)
          .map(v => JsonDocVersions.readDvs(backing, v).size).getOrElse(0)
        maxDvs = math.max(maxDvs, live)
      }
      assert(maxDvs <= 8,
        s"MV backing DV debt must stay bounded, peaked at $maxDvs")
      assert(spark.sql(s"SELECT op FROM $cat.`$backing#history` " +
        "WHERE op = 'optimize'").count() >= 1,
        "the backing history must show repayment commits")
      // the compacted view still equals a recompute
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      try {
        def sorted(sql: String) = spark.sql(sql).collect().toSeq
          .map(r => (0 until r.length).map(i => r.get(i))).sortBy(_.mkString("|"))
        assert(sorted(s"SELECT * FROM $cat.dvac.m") === sorted(body))
      } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    } finally spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
  }
}
