package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** NAMED BRANCHES (r14, [[JsonDocRefs.branches]]): multi-commit
  * write-audit-publish — successive `branch`-option writes stage a
  * CHAIN (each commit's parent = the previous head), invisible to every
  * current read; `VERSION AS OF '<branch>'` audits the head;
  * `CALL publish(path, '<branch>')` re-applies the chain's CUMULATIVE
  * delta over later published work and spends the pointer. Branch
  * chains are append-only; retention pins the whole chain. */
class BranchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("branch-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_branch").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // v1
    (tbl, s"$root/t")
  }

  private def keys(tbl: String, suffix: String = ""): Seq[Long] =
    spark.sql(s"SELECT k FROM $tbl $suffix ORDER BY k")
      .collect().map(_.getLong(0)).toSeq

  test("a branch chains staged commits; the head is the cumulative audit read; publish applies it all") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    spark.sql(s"CALL graftcat.create_branch('$path', 'ingest')")
    Seq((3L, 30.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "ingest").append() // staged v2, parent 1
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "ingest").append() // staged v3, parent 2
    // both invisible; the branch head sees BOTH (the chain, not one stage)
    assert(keys(tbl) === Seq(1L, 2L))
    assert(keys(tbl, "VERSION AS OF 'ingest'") === Seq(1L, 2L, 3L, 4L))
    val refs = spark.sql(s"SELECT name, type, version FROM graftcat.`$path#refs`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(refs === Seq(("ingest", "branch", 3L)))
    // published work lands meanwhile; the cumulative delta survives it
    Seq((9L, 90.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // published v4
    val pub = spark.sql(s"CALL graftcat.publish('$path', 'ingest')")
      .collect()(0).getLong(0)
    assert(pub === 5L)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 9L))
    // the pointer is SPENT: a further branch write refuses loudly
    val e = intercept[Exception] {
      Seq((5L, 50.0)).toDF("k", "v").coalesce(1)
        .writeTo(tbl).option("branch", "ingest").append()
    }
    def msgs(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(msgs(e).exists(_.contains("no branch")), e.getMessage)
  }

  test("branch chains are append-only and require create_branch; retention pins the whole chain") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    val unknown = intercept[Exception] {
      Seq((3L, 30.0)).toDF("k", "v").coalesce(1)
        .writeTo(tbl).option("branch", "nope").append()
    }
    assert(Iterator.iterate(unknown: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("create_branch"))))
    spark.sql(s"CALL graftcat.create_branch('$path', 'b')")
    val ow = intercept[Exception] {
      Seq((9L, 90.0)).toDF("k", "v").coalesce(1)
        .writeTo(tbl).option("branch", "b")
        .overwrite(org.apache.spark.sql.functions.lit(true))
    }
    assert(Iterator.iterate(ow: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("append-only"))))
    // two chain commits, then retention keep-last-1: the chain survives
    Seq((3L, 30.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "b").append()
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "b").append()
    GraftCatalog.vacuum(path, keepLast = 1)
    assert(keys(tbl, "VERSION AS OF 'b'") === Seq(1L, 2L, 3L, 4L))
    // a chain member cannot be discarded from under the branch
    val mid = intercept[Exception] { GraftCatalog.discardStaged(path, 2) }
    assert(mid.getMessage.contains("drop_branch"))
    // dropping the branch releases the chain: the stages become
    // discardable, and vacuum then sweeps their files
    spark.sql(s"CALL graftcat.drop_branch('$path', 'b')")
    GraftCatalog.discardStaged(path, 3)
    GraftCatalog.discardStaged(path, 2)
    GraftCatalog.vacuum(path, keepLast = 1)
    assert(keys(tbl) === Seq(1L, 2L))
    val gone = intercept[Exception] { keys(tbl, "VERSION AS OF 3") }
    assert(gone.getMessage.contains("does not exist") ||
      gone.getMessage.contains("vacuumed"))
  }

  test("fast_forward: O(1) adoption when the head hasn't moved; OCC refusal when it has") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    spark.sql(s"CALL graftcat.create_branch('$path', 'ff')")
    Seq((3L, 30.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "ff").append() // staged v2
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "ff").append() // staged v3
    val v = spark.sql(s"CALL graftcat.fast_forward('$path', 'ff')")
      .collect()(0).getLong(0)
    assert(v === 4L)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L))
    // the pointer is spent, the stages are marker-claimed: no re-apply door
    val dup = intercept[Exception] { GraftCatalog.publish(path, 3) }
    assert(dup.getMessage.contains("already published"), dup.getMessage)
    // OCC refusal: a second branch forks, then published work lands
    spark.sql(s"CALL graftcat.create_branch('$path', 'ff2')")
    Seq((5L, 50.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "ff2").append()
    Seq((9L, 90.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // head moves
    val moved = intercept[Exception] {
      spark.sql(s"CALL graftcat.fast_forward('$path', 'ff2')")
    }
    assert(moved.getMessage.contains("publish"), moved.getMessage)
    // ...and publish (re-application) still works on that branch
    spark.sql(s"CALL graftcat.publish('$path', 'ff2')")
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L, 9L))
  }

  test("cherry_pick publishes ONE mid-chain stage; the chain then refuses cumulative publish") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    spark.sql(s"CALL graftcat.create_branch('$path', 'cp')")
    Seq((3L, 30.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "cp").append() // staged v2: the pick
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("branch", "cp").append() // staged v3
    // published work lands; the pick re-applies over it
    Seq((9L, 90.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // v4
    val v = spark.sql(s"CALL graftcat.cherry_pick('$path', 2)")
      .collect()(0).getLong(0)
    assert(v === 5L)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 9L),
      "cherry-pick must apply ONE stage's delta, not the cumulative chain")
    // picking the same stage twice is refused (wap.id dedup)
    val dup = intercept[Exception] { GraftCatalog.cherryPick(path, 2) }
    assert(dup.getMessage.contains("already published"), dup.getMessage)
    // the chain's cumulative publish would re-apply the picked stage:
    // refused loudly, with the remaining stage still cherry-pickable
    val poisoned = intercept[Exception] {
      spark.sql(s"CALL graftcat.publish('$path', 'cp')")
    }
    assert(poisoned.getMessage.contains("cherry-pick"), poisoned.getMessage)
    spark.sql(s"CALL graftcat.cherry_pick('$path', 3)")
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 9L))
    spark.sql(s"CALL graftcat.drop_branch('$path', 'cp')")
    // published history is not cherry-pickable
    val pub = intercept[Exception] { GraftCatalog.cherryPick(path, 4) }
    assert(pub.getMessage.contains("not a staged snapshot"), pub.getMessage)
  }
}
