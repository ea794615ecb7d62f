package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** METADATA-ONLY DELETE + TRUNCATE (r16 self-review — [[JsonDocTable
  * .canDeleteWhere]]): pins the REAL BUG this closes (`DELETE FROM t`
  * with no WHERE was a SILENT NO-OP on copy-on-write tables: the
  * optimizer collapses the statically-empty rewrite side, the replace
  * scope never reports, the commit retires nothing), plus the fast
  * paths it adds — whole-table truncation and identity-partition point
  * deletes retire files in ONE manifest commit with no data read or
  * written, cold files byte-untouched, history time-travelable, the
  * change feed emitting the delete images — and the refusal paths that
  * keep everything else on the ordinary rewrite. */
class MetadataDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("metadata-delete-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(ddlTail: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_mdel").toString
    (s"graftcat.`$root/t`", s"$root/t")
  }

  test("DELETE with no WHERE empties a copy-on-write table (the silent no-op, fixed)") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val vBefore = JsonDocVersions.latestVersion(path).get
    spark.sql(s"DELETE FROM $tbl")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 0L,
      "DELETE FROM t must actually delete (was a silent no-op)")
    // ONE metadata commit: no data files written, history preserved
    val vAfter = JsonDocVersions.latestVersion(path).get
    assert(vAfter === vBefore + 1)
    assert(JsonDocVersions.readOp(path, vAfter).contains("delete"))
    assert(JsonDocVersions.latest(path).get._2.isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF $vBefore")
      .collect()(0).getLong(0) === 3L, "retired rows stay time-travelable")
    // the change feed emits the delete images
    val feed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("startingVersion", vAfter.toString).option("path", path).load()
    assert(feed.collect().map(_.getAs[String]("_change_type")).toSeq
      === Seq.fill(3)("delete"))
    // WHERE true folds to the same path
    spark.sql(s"INSERT INTO $tbl VALUES (9, 9.0)")
    spark.sql(s"DELETE FROM $tbl WHERE 1 = 1")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 0L)
  }

  test("TRUNCATE TABLE works and is one metadata commit") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1), (2)")
    spark.sql(s"TRUNCATE TABLE $tbl")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 0L)
    val v = JsonDocVersions.latestVersion(path).get
    assert(JsonDocVersions.readOp(path, v).contains("truncate"))
    spark.sql(s"INSERT INTO $tbl VALUES (7)") // writable afterwards
    assert(spark.sql(s"SELECT k FROM $tbl").collect()(0).getLong(0) === 7L)
  }

  test("identity-partition point DELETE is metadata-only: cold files byte-untouched") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (region STRING, k BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region)")
    import spark.implicits._
    Seq(("emea", 1L), ("emea", 2L), ("apac", 3L), ("amer", 4L))
      .toDF("region", "k").coalesce(1).writeTo(tbl).append()
    val dir = new java.io.File(path)
    val before = JsonDocVersions.latest(path).get._2.map { rel =>
      rel -> java.nio.file.Files.getLastModifiedTime(
        new java.io.File(dir, rel).toPath).toMillis
    }.toMap
    spark.sql(s"DELETE FROM $tbl WHERE region = 'emea'")
    val v = JsonDocVersions.latestVersion(path).get
    assert(JsonDocVersions.readOp(path, v).contains("delete"),
      "an identity-partition point delete must be the metadata path")
    val after = JsonDocVersions.latest(path).get._2
    assert(after === before.keySet.filterNot(_.startsWith("region=emea/")))
    after.foreach { rel =>
      assert(java.nio.file.Files.getLastModifiedTime(
        new java.io.File(dir, rel).toPath).toMillis === before(rel),
        s"cold file $rel must be byte-untouched (no rewrite ran)")
    }
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(3L, 4L))
    // IN over partition values through the same path
    spark.sql(s"DELETE FROM $tbl WHERE region IN ('apac', 'ghost')")
    assert(JsonDocVersions.readOp(path,
      JsonDocVersions.latestVersion(path).get).contains("delete"))
    assert(spark.sql(s"SELECT k FROM $tbl").collect().map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("refusals: data-column and transform predicates keep the ordinary rewrite") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (region STRING, k BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region)")
    import spark.implicits._
    Seq(("emea", 1L), ("emea", 2L), ("apac", 3L))
      .toDF("region", "k").coalesce(1).writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // data column: rewrite path
    val v = JsonDocVersions.latestVersion(path).get
    assert(JsonDocVersions.readOp(path, v).contains("rewrite"),
      s"a data-column delete must stay on the rewrite path, got " +
        s"${JsonDocVersions.readOp(path, v)}")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // mixed partition + data predicate: rewrite, still exact
    spark.sql(s"DELETE FROM $tbl WHERE region = 'emea' AND k = 1")
    assert(spark.sql(s"SELECT k FROM $tbl").collect().map(_.getLong(0)).toSeq === Seq(3L))
    // bucket-transform partitions never take the metadata path
    val (tbl2, path2) = fresh()
    val t2 = tbl2.replace("/t`", "/t2`")
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, v DOUBLE) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $t2 VALUES (1, 1.0), (2, 2.0)")
    spark.sql(s"DELETE FROM $t2 WHERE k = 1")
    assert(spark.sql(s"SELECT k FROM $t2").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("merge-on-read tables take the metadata path for truncating deletes too") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $tbl VALUES (1), (2)")
    spark.sql(s"DELETE FROM $tbl")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 0L)
    assert(JsonDocVersions.readOp(path,
      JsonDocVersions.latestVersion(path).get).contains("delete"),
      "no DV should be written when the whole table retires")
  }
}
