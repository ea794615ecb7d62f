package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** COLUMN DEFAULT VALUES (r15, Delta's model): `DEFAULT <literal>` in
  * CREATE TABLE and `ALTER COLUMN ... SET/DROP DEFAULT` — recorded as
  * CURRENT_DEFAULT field metadata in the schema sidecar and filled by
  * Spark's analyzer into INSERTs that omit the column (or write the
  * DEFAULT keyword). Reads never apply defaults: rows written before a
  * default existed read NULL, which is exactly why ADD COLUMN refuses
  * an inline DEFAULT (it would promise history the reader does not
  * serve). */
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

  test("ADD COLUMN with an inline DEFAULT refuses with guidance") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tag STRING DEFAULT 'x')")
    }
    assert(e.getMessage.contains("SET DEFAULT"),
      s"refusal must point at the honest two-step path, got: ${e.getMessage}")
  }

  test("a non-literal default is refused — insert values must not depend on analysis time") {
    val (tbl, _) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING) USING `graft-jsondoc`")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ALTER COLUMN tag SET DEFAULT CAST(rand() AS STRING)")
    }
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
