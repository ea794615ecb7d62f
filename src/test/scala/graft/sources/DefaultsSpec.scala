package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** COLUMN DEFAULT VALUES (r15; completed r16 — Delta's model):
  * `DEFAULT <expr>` in CREATE TABLE / ADD COLUMN / `ALTER COLUMN ...
  * SET/DROP DEFAULT`. CURRENT_DEFAULT (any constant deterministic
  * expression, CURRENT_TIMESTAMP included) is filled by Spark's
  * analyzer into INSERTs that omit the column; EXISTS_DEFAULT — frozen
  * to a literal at DDL time — is served by the READER for rows whose
  * lines predate an ADD COLUMN (a truly absent JSON key; explicit
  * nulls stay null), so ADD COLUMN DEFAULT works end-to-end and the
  * change feed emits the filled values consistently. */
class DefaultsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("defaults-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_defaults").toString
    (s"graftcat.`$root/t`", s"$root/t")
  }

  private def rows(tbl: String): Seq[(Long, String)] =
    spark.sql(s"SELECT k, tag FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq

  test("CREATE TABLE with DEFAULT fills omitted columns and the DEFAULT keyword") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING DEFAULT 'fresh') " +
      "USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (1)")
    spark.sql(s"INSERT INTO $tbl VALUES (2, DEFAULT)")
    spark.sql(s"INSERT INTO $tbl VALUES (3, 'explicit')")
    assert(rows(tbl) === Seq((1L, "fresh"), (2L, "fresh"), (3L, "explicit")))
  }

  test("SET DEFAULT governs future inserts only; pre-default rows stay NULL; DROP DEFAULT reverts") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1)")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tag STRING)")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (2)") // no default yet
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN tag SET DEFAULT 'filled'")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (3)")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (4)")
    assert(rows(tbl) === Seq((1L, null), (2L, null), (3L, "filled"), (4L, null)),
      "only the insert under the live default is filled; history is never rewritten")
    // the default lives in the sidecar: a fresh catalog resolution sees it
    val meta = GraftCatalog.readSchema(new java.io.File(path)).get("tag").metadata
    assert(!meta.contains("CURRENT_DEFAULT"), "DROP DEFAULT must clear the sidecar")
  }

  test("ADD COLUMN DEFAULT: old rows read the frozen value, new inserts fill; nulls stay null") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1), (2)") // pre-add lines lack `tag`
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tag STRING DEFAULT 'legacy')")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (3)") // insert-time fill
    spark.sql(s"INSERT INTO $tbl VALUES (4, NULL)") // explicit null is a VALUE
    spark.sql(s"INSERT INTO $tbl VALUES (5, 'real')")
    assert(rows(tbl) === Seq((1L, "legacy"), (2L, "legacy"), (3L, "legacy"),
      (4L, null), (5L, "real")),
      "pre-add rows read the frozen EXISTS_DEFAULT; explicit nulls stay null")
    // filters see the same fill: the defaulted value matches pre-add rows
    assert(spark.sql(s"SELECT k FROM $tbl WHERE tag = 'legacy' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE tag IS NOT NULL")
      .collect()(0).getLong(0) === 4L)
    // the change feed emits the filled values consistently
    val feed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("path", path).load()
    val feedTags = feed.filter(org.apache.spark.sql.functions.col("k") <= 2)
      .select("tag").collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(feedTags.toSeq === Seq("legacy", "legacy"),
      "the feed serves pre-add rows with the frozen default, like any read")
    // a LATER SET DEFAULT never rewrites history: the frozen exists-
    // default stays what the ADD COLUMN promised
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN tag SET DEFAULT 'newer'")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (6)")
    assert(rows(tbl).take(3).map(_._2) === Seq("legacy", "legacy", "legacy"))
    assert(rows(tbl).last === (6L, "newer"))
  }

  test("expression defaults: CURRENT_TIMESTAMP shapes evaluate at insert; rand() refuses") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, ts_ms BIGINT, tag STRING) " +
      "USING `graft-jsondoc`")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN tag SET DEFAULT CAST(rand() AS STRING)")
    }
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN ts_ms " +
      "SET DEFAULT unix_millis(CURRENT_TIMESTAMP())")
    val before = System.currentTimeMillis() - 60000
    spark.sql(s"INSERT INTO $tbl (k) VALUES (1)")
    val got = spark.sql(s"SELECT ts_ms FROM $tbl").collect()(0).getLong(0)
    assert(got >= before && got <= System.currentTimeMillis() + 60000,
      s"CURRENT_TIMESTAMP default must evaluate at insert time, got $got")
    // a constant arithmetic expression works too
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN ts_ms SET DEFAULT 40 + 2")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (2)")
    assert(spark.sql(s"SELECT ts_ms FROM $tbl WHERE k = 2")
      .collect()(0).getLong(0) === 42L)
    // a column reference can never be a default — Spark's analyzer
    // refuses it before the catalog; the catalog's own constant check
    // backstops non-SQL callers
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN tag SET DEFAULT concat(tag, 'x')")
    }
    assert(e.getMessage.contains("INVALID_DEFAULT_VALUE") ||
      e.getMessage.contains("constant"))
  }

  test("bare reads serve the same existence defaults as catalog reads (sidecar-authoritative)") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1)")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tag STRING DEFAULT 'legacy')")
    // the bare reader's user-declared schema carries no metadata — the
    // sidecar must still win, or the two read APIs would serve
    // different rows from the same table
    val bare = spark.read.format("graft-jsondoc").schema("k BIGINT, tag STRING")
      .option("path", path).load()
    assert(bare.select("tag").collect()(0).getString(0) === "legacy")
    // filters through the bare path see the fill too
    assert(bare.filter(org.apache.spark.sql.functions.col("tag") === "legacy")
      .count() === 1L)
  }

  test("defaults survive into merge-on-read DML inserts") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING DEFAULT 'mor') " +
      "USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (1)")
    spark.sql(s"INSERT INTO $tbl (k) VALUES (2)")
    spark.sql(s"DELETE FROM $tbl WHERE k = 1")
    assert(rows(tbl) === Seq((2L, "mor")))
  }
}
