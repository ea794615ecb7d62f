package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The transparent text-index rewrite
  * ([[graft.plans.RewriteOntoTextIndex]]): the q101 tokenization front
  * over an indexed graft table is answered from the postings —
  * occurrence rows reconstruct as `explode(array_repeat(term, tf))`.
  * Pins, both directions: the full BM25 dataflow reads NO base table
  * (postings only) and is byte-equal to the rule-disabled run;
  * staleness blocks serving until refresh (exactly like an
  * out-of-budget MV); a pinned time-travel read never rewrites; a
  * projection needing other base columns never rewrites; the kill
  * switch disables the rule. */
class TextIndexRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new graft.plans.GraftExtensions)
    .appName("text-index-rewrite-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val cat = "graftcat"
  private var root: String = _
  private var basePath: String = _
  private var tbl: String = _

  override def beforeAll(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[GraftCatalog].getName)
    root = java.nio.file.Files.createTempDirectory("graft_tir").toString
    basePath = new java.io.File(s"$root/docs").getAbsolutePath
    tbl = s"$cat.`$basePath`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING, title STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $tbl VALUES " +
      "(1, 'alpha beta beta gamma', 'one'), (2, 'beta gamma gamma delta', 'two'), " +
      "(3, 'alpha alpha delta', 'three'), (4, 'epsilon zeta', 'four')")
    spark.sql(s"CALL $cat.create_text_index('$root/idx', '$basePath', 8)").collect()
  }

  private def scans(df: DataFrame): (Boolean, Boolean) = {
    var base = false; var postings = false
    df.queryExecution.analyzed.foreach {
      case r: DataSourceV2Relation => r.table match {
        case j: JsonDocTable =>
          if (j.tablePath == basePath) base = true
          else if (j.tablePath.endsWith("/postings")) postings = true
        case _ =>
      }
      case _ =>
    }
    (base, postings)
  }

  /** The q101 BM25 dataflow over the TABLE (tokenization front +
    * lens + tf + df + stats) — the shape the rule intercepts twice. */
  private def bm25(terms: Seq[String]): DataFrame = {
    val toks = spark.sql(s"SELECT doc_id, text FROM $tbl")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val w = col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(df), "term").join(lens, "doc_id").crossJoin(broadcast(stats))
      .groupBy(col("doc_id")).agg(round(sum(idf * w), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
  }

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))

  test("the q101 dataflow serves from postings, byte-equal to the base scan") {
    val on = bm25(Seq("alpha", "beta"))
    val (base, postings) = scans(on)
    assert(postings && !base,
      s"expected a postings-only plan (base=$base postings=$postings)")
    val got = rows(on)
    spark.conf.set("spark.graft.text.rewrite.enabled", "false")
    try {
      val off = bm25(Seq("alpha", "beta"))
      val (base2, postings2) = scans(off)
      assert(base2 && !postings2, "the kill switch must restore the base scan")
      assert(got === rows(off), "the rewrite changed the answer")
    } finally spark.conf.set("spark.graft.text.rewrite.enabled", "true")
  }

  test("stale serving within budget is exact; the budget gate and pins hold") {
    // an insert, a text-mutating update and a delete land UNfolded
    spark.sql(s"INSERT INTO $tbl VALUES (5, 'beta beta beta', 'five')")
    spark.sql(s"UPDATE $tbl SET text = 'alpha only now' WHERE doc_id = 2")
    spark.sql(s"DELETE FROM $tbl WHERE doc_id = 4")
    // within the default budget: serves as postings ⊕ feed-tokenized
    // changed docs — exact, no base scan
    val stale = bm25(Seq("alpha", "beta"))
    val (base, postings) = scans(stale)
    assert(postings && !base,
      "a stale index within budget must serve postings + feed")
    val staleRows = rows(stale)
    spark.conf.set("spark.graft.text.rewrite.enabled", "false")
    try assert(staleRows === rows(bm25(Seq("alpha", "beta"))),
      "stale serving changed the answer")
    finally spark.conf.set("spark.graft.text.rewrite.enabled", "true")
    // the budget is a hard gate
    spark.conf.set("spark.graft.text.rewrite.maxStaleCommits", "0")
    try {
      val blocked = bm25(Seq("alpha", "beta"))
      assert(scans(blocked) === ((true, false)),
        "beyond the budget the base scan must serve")
    } finally spark.conf.unset("spark.graft.text.rewrite.maxStaleCommits")
    // refreshed: postings alone again, same answers
    spark.sql(s"CALL $cat.refresh_text_index('$root/idx')").collect()
    val fresh = bm25(Seq("alpha", "beta"))
    assert(scans(fresh) === ((false, true)), "refreshed index serves again")
    assert(rows(fresh) === staleRows,
      "refresh must not change what stale serving already answered")
    spark.conf.set("spark.graft.text.rewrite.enabled", "false")
    try assert(rows(fresh) === rows(bm25(Seq("alpha", "beta"))),
      "post-refresh serving changed the answer")
    finally spark.conf.set("spark.graft.text.rewrite.enabled", "true")
    // a pinned read names a snapshot the index does not represent
    val pinned = spark.sql(s"SELECT doc_id, text FROM $tbl VERSION AS OF 1")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    assert(scans(pinned) === ((true, false)), "a time-travel read must not rewrite")
  }

  test("a projection needing other base columns never rewrites") {
    val withText = spark.sql(s"SELECT doc_id, text FROM $tbl")
      .select(col("doc_id"), col("text"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    assert(scans(withText) === ((true, false)),
      "text passthrough cannot come from postings")
    // a different tokenizer pattern is not the indexed one
    val otherTok = spark.sql(s"SELECT doc_id, text FROM $tbl")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
          .as("term"))
    assert(scans(otherTok) === ((true, false)),
      "a different tokenizer must not serve from the index")
    // r18 review: tokenizing a DIFFERENT string column of the indexed
    // table must never serve the text column's postings
    val otherCol = spark.sql(s"SELECT doc_id, title FROM $tbl")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("title")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    assert(scans(otherCol) === ((true, false)),
      "tokenizing a non-indexed column must read the base")
    assert(otherCol.collect().map(_.getString(1)).toSet ===
      Set("one", "two", "three", "five"), // doc 4 deleted upstream
      "the non-indexed column's tokens must come from that column")
  }
}
