package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** THREE-WAY BRANCH MERGE (r17, [[GraftCatalog.mergeBranch]]) — the
  * Txn2Spec-style matrix the verdict asked for: chains whose touched
  * files are DISJOINT from the published side's commute and merge onto
  * the moved head; overlapping touches refuse LOUDLY, LISTING the
  * files, leaving both the table and the branch intact; the merged
  * commit claims every member's published marker (no re-publication),
  * spends the pointer, and surfaces in the change feed like any
  * content commit. fast_forward/publish behavior is untouched. */
class MergeBranchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    .config("spark.ui.enabled", "false")
    .appName("merge-branch-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** A MOR table seeded as TWO single-file commits: file A holds
    * k 1–3, file B holds k 4–6 — so row-level DML on {1..3} and {4..6}
    * provably touches different files. */
  private def fresh(): (String, String) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mb").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append() // v1 = file A
    Seq((4L, "d"), (5L, "e"), (6L, "f")).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append() // v2 = file B
    (s"$root/t", tbl)
  }

  private def keys(tbl: String): Seq[Long] =
    spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq

  private def branchDml(tbl: String, path: String, branch: String)(sql: String): Unit = {
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.wap.branch' = '$branch')")
    try spark.sql(sql)
    finally spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('write.wap.branch')")
  }

  test("disjoint touches commute: branch append+delete merges over published append+delete") {
    import spark.implicits._
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    // branch: append new rows, DV-delete k=2 (touches file A only)
    Seq((10L, "x")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "dev").append()
    branchDml(tbl, path, "dev")(s"DELETE FROM $tbl WHERE k = 2")
    // published side moves meanwhile: append + DV-delete k=5 (file B only)
    Seq((20L, "y")).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE k = 5")
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 6L, 20L),
      "branch work must be invisible before the merge")
    val v = spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
      .collect()(0).getLong(0)
    assert(keys(tbl) === Seq(1L, 3L, 4L, 6L, 10L, 20L),
      "the merge must land BOTH sides' appends and deletes")
    assert(JsonDocVersions.readOp(path, v.toInt).contains("merge-branch"))
    // the pointer is SPENT; the chain cannot re-publish
    val e = intercept[Exception] {
      spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
    }
    assert(e.getMessage.contains("no branch"), e.getMessage)
    // the merged commit surfaces in the change feed as ordinary content
    val feed = spark.sql(s"SELECT _change_type, k FROM graftcat.`$path#changes` " +
      s"WHERE _commit_version = $v").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(feed.contains(("insert", 10L)) && feed.contains(("delete", 2L)),
      s"the feed must carry the merged delta: $feed")
  }

  test("overlapping touches refuse loudly, listing the files; table and branch intact") {
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    branchDml(tbl, path, "dev")(s"DELETE FROM $tbl WHERE k = 1") // DV on file A
    spark.sql(s"DELETE FROM $tbl WHERE k = 3") // published DV on file A too
    val before = keys(tbl)
    val e = intercept[Exception] {
      spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
    }
    assert(e.getMessage.contains("do not commute"), e.getMessage)
    assert(e.getMessage.contains(".jsonl"),
      s"the refusal must LIST the colliding files: ${e.getMessage}")
    assert(keys(tbl) === before, "a refused merge must not dent the table")
    // the branch survives for rebase-or-discard: its head still audits
    val head = JsonDocRefs.branches(path)("dev")
    assert(spark.sql(s"SELECT k FROM $tbl VERSION AS OF $head ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L, 4L, 5L, 6L),
      "the branch head must still audit after a refused merge")
    spark.sql(s"CALL graftcat.drop_branch('$path', 'dev')") // rebase path
  }

  test("published retire (compaction) of a branch-DV'd file is a conflict too") {
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    branchDml(tbl, path, "dev")(s"DELETE FROM $tbl WHERE k = 1") // DV on file A
    // published OPTIMIZE rewrites A+B into one file: A is retired
    spark.sql(s"CALL graftcat.optimize('$path', ${64 * 1024 * 1024})")
    val e = intercept[Exception] {
      spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
    }
    assert(e.getMessage.contains("do not commute"), e.getMessage)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("head unmoved: merge degenerates to adoption semantics; fast_forward untouched") {
    import spark.implicits._
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    Seq((10L, "x")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "dev").append()
    val v = spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
      .collect()(0).getLong(0)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L))
    assert(v > 0)
    // fast_forward still behaves on a second branch (regression)
    spark.sql(s"CALL graftcat.create_branch('$path', 'ff')")
    Seq((11L, "z")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "ff").append()
    spark.sql(s"CALL graftcat.fast_forward('$path', 'ff')")
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L))
  }

  test("branch DML sees the branch's OWN work: delete a branch-added row, then merge") {
    import spark.implicits._
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    Seq((10L, "x"), (11L, "y")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "dev").append()
    // the DELETE's scan is pinned to the branch head, so k=10 (which
    // published state has never seen) matches — the r14 append-only
    // rule's "incoherent scan" objection, resolved
    branchDml(tbl, path, "dev")(s"DELETE FROM $tbl WHERE k = 10")
    // audit: the branch head reads its own append minus its own delete
    val head = JsonDocRefs.branches(path)("dev")
    assert(spark.sql(s"SELECT k FROM $tbl VERSION AS OF $head ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L, 11L))
    spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L, 11L),
      "the merged state must carry the branch-added file WITH its DV")
  }

  test("branch sessions never leak through the metadata shortcuts (r17 self-review)") {
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.wap.branch' = 'dev')")
    try {
      // a no-WHERE DELETE would have taken the metadata path and
      // emptied the PUBLISHED table; under a branch the shortcut is
      // withdrawn and the statement refuses LOUDLY at planning (the
      // optimizer already discarded the row-level plan) — never a
      // visible publish
      val e0 = intercept[Exception] { spark.sql(s"DELETE FROM $tbl") }
      assert(e0.getMessage.contains("Cannot delete"), e0.getMessage)
      assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L),
        "the refused DELETE must not dent the published table")
      // a DATA-predicate delete never enters the shortcut: stages fine
      spark.sql(s"DELETE FROM $tbl WHERE k >= 1 AND v IS NOT NULL AND k % 1 = 0")
      assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L),
        "the staged delete must stay invisible to published reads")
      val head = JsonDocRefs.branches(path)("dev")
      assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF $head")
        .collect()(0).getLong(0) === 0L, "the branch head must read empty")
      // TRUNCATE cannot stage: refuse loudly, published table intact
      val e = intercept[Exception] { spark.sql(s"TRUNCATE TABLE $tbl") }
      assert(e.getMessage.contains("cannot be staged on a branch"), e.getMessage)
      assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    } finally spark.sql(s"ALTER TABLE $tbl UNSET TBLPROPERTIES ('write.wap.branch')")
    // DROP PARTITION under a branch refuses the same way
    val root2 = java.nio.file.Files.createTempDirectory("graft_mb_dp").toString
    val t2 = s"graftcat.`$root2/t`"
    import spark.implicits._
    spark.sql(s"CREATE TABLE $t2 (k BIGINT, g STRING) USING `graft-jsondoc` " +
      "PARTITIONED BY (g)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "g").coalesce(1).writeTo(t2).append()
    spark.sql(s"CALL graftcat.create_branch('$root2/t', 'dev')")
    spark.sql(s"ALTER TABLE $t2 SET TBLPROPERTIES ('write.wap.branch' = 'dev')")
    try {
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE $t2 DROP PARTITION (g = 'a')")
      }
      assert(e2.getMessage.contains("cannot be staged on a branch"), e2.getMessage)
      assert(spark.sql(s"SELECT count(*) FROM $t2").collect()(0).getLong(0) === 2L)
    } finally spark.sql(s"ALTER TABLE $t2 UNSET TBLPROPERTIES ('write.wap.branch')")
  }

  test("a cherry-picked member poisons the merge (no double application)") {
    import spark.implicits._
    val (path, tbl) = fresh()
    spark.sql(s"CALL graftcat.create_branch('$path', 'dev')")
    Seq((10L, "x")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "dev").append()
    val mid = JsonDocRefs.branches(path)("dev")
    Seq((11L, "y")).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "dev").append()
    spark.sql(s"CALL graftcat.cherry_pick('$path', $mid)")
    val e = intercept[Exception] {
      spark.sql(s"CALL graftcat.merge_branch('$path', 'dev')")
    }
    assert(e.getMessage.contains("cherry-picked"), e.getMessage)
  }
}
