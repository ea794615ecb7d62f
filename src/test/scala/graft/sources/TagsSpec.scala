package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** NAMED SNAPSHOT TAGS (r14, [[JsonDocRefs]]): `CALL create_tag` /
  * `drop_tag`, `VERSION AS OF '<name>'` resolution through the same
  * pinned path as numeric versions, the retention pin (vacuum and
  * expire_snapshots never reclaim a tagged version), immutability
  * (re-point = drop + create), and the `#refs` inventory. q195 carries
  * the corpus-scale oracle row. */
class TagsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("tags-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** v1 = {1,2,3}, v2 = {1,2,3,4}, v3 = v2 minus k=1. */
  private def threeVersionTable(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_tags").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append() // v1
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v3
    (tbl, s"$root/t")
  }

  private def keysAt(tbl: String, version: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $tbl VERSION AS OF $version ORDER BY k")
      .collect().map(_.getLong(0)).toSeq

  test("a tag resolves to exactly the numeric-version read, for data and #files") {
    val (tbl, path) = threeVersionTable()
    spark.sql(s"CALL graftcat.create_tag('$path', 'before-delete', 2)")
    assert(keysAt(tbl, "'before-delete'") === keysAt(tbl, "2"))
    assert(keysAt(tbl, "'before-delete'") === Seq(1L, 2L, 3L, 4L))
    val byTag = spark.sql(
      s"SELECT file FROM graftcat.`$path#files` VERSION AS OF 'before-delete' ORDER BY file")
      .collect().map(_.getString(0)).toSeq
    val byV = spark.sql(
      s"SELECT file FROM graftcat.`$path#files` VERSION AS OF 2 ORDER BY file")
      .collect().map(_.getString(0)).toSeq
    assert(byTag === byV && byTag.nonEmpty)
  }

  test("create_tag(-1) tags the CURRENT version; #refs lists every tag") {
    val (_, path) = threeVersionTable()
    val v = spark.sql(s"CALL graftcat.create_tag('$path', 'head', -1)")
      .collect()(0).getLong(0)
    assert(v === 3L)
    spark.sql(s"CALL graftcat.create_tag('$path', 'first', 1)")
    val refs = spark.sql(s"SELECT name, type, version FROM graftcat.`$path#refs` ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs === Seq(("first", "tag", 1L), ("head", "tag", 3L)))
  }

  test("vacuum and expire_snapshots never reclaim a tagged version; dropping the tag releases it") {
    val (tbl, path) = threeVersionTable()
    spark.sql(s"CALL graftcat.create_tag('$path', 'audit', 1)")
    // count-based: keep last 1 -> v2 reclaimed, v1 survives on the tag
    GraftCatalog.vacuum(path, keepLast = 1)
    assert(keysAt(tbl, "'audit'") === Seq(1L, 2L, 3L))
    assert(JsonDocVersions.read(path, 2).isEmpty, "untagged v2 must be reclaimed")
    // time-based over what remains: cutoff in the future would drop v1
    // too, were it not tagged
    GraftCatalog.expireSnapshots(path, System.currentTimeMillis() + 600000L)
    assert(keysAt(tbl, "'audit'") === Seq(1L, 2L, 3L))
    // released: the next vacuum reclaims v1, and the tag name is gone
    spark.sql(s"CALL graftcat.drop_tag('$path', 'audit')")
    GraftCatalog.vacuum(path, keepLast = 1)
    val e = intercept[Exception] { keysAt(tbl, "'audit'") }
    assert(e.getMessage.contains("audit") || e.getMessage.contains("neither"))
    assert(JsonDocVersions.read(path, 1).isEmpty, "released v1 must be reclaimable")
  }

  test("tags are immutable and validated: dup/numeric/missing-version/unknown-drop all refuse") {
    val (_, path) = threeVersionTable()
    spark.sql(s"CALL graftcat.create_tag('$path', 'audit', 1)")
    val dup = intercept[Exception] { JsonDocRefs.createTag(path, "audit", 2) }
    assert(dup.getMessage.contains("immutable"))
    val num = intercept[Exception] { JsonDocRefs.createTag(path, "42", 1) }
    assert(num.getMessage.contains("ambiguous"))
    val missing = intercept[Exception] { JsonDocRefs.createTag(path, "ghost", 99) }
    assert(missing.getMessage.contains("no such committed"))
    val unknown = intercept[Exception] { JsonDocRefs.dropTag(path, "nope") }
    assert(unknown.getMessage.contains("no tag"))
    val unresolved = intercept[Exception] {
      spark.sql(s"SELECT * FROM graftcat.`$path` VERSION AS OF 'nope'").collect()
    }
    assert(unresolved.getMessage.contains("neither an integer"))
  }

  test("create_tag(-1) under a staged head tags the PUBLISHED version (advice r15)") {
    val (tbl, path) = threeVersionTable()
    import spark.implicits._
    Seq((9L, 90.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v4 = max manifest
    val v = spark.sql(s"CALL graftcat.create_tag('$path', 'head', -1)")
      .collect()(0).getLong(0)
    assert(v === 3L,
      "-1 = 'current version' must resolve to the latest PUBLISHED snapshot, " +
        "not an invisible staged head")
    assert(keysAt(tbl, "'head'") ===
      spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq)
  }

  test("discarding a TAGGED stage is refused; dropping the tag releases it (advice r15)") {
    val (tbl, path) = threeVersionTable()
    import spark.implicits._
    Seq((9L, 90.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v4
    spark.sql(s"CALL graftcat.create_tag('$path', 'wap-audit', 4)") // the WAP audit-tag idiom
    val e = intercept[Exception] { GraftCatalog.discardStaged(path, 4) }
    assert(e.getMessage.contains("drop_tag"), e.getMessage)
    assert(keysAt(tbl, "'wap-audit'") === Seq(2L, 3L, 4L, 9L),
      "the refused discard must leave the tagged stage readable")
    spark.sql(s"CALL graftcat.drop_tag('$path', 'wap-audit')")
    GraftCatalog.discardStaged(path, 4)
    assert(JsonDocVersions.read(path, 4).isEmpty)
  }
}
