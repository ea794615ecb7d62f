package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** WRITE-AUDIT-PUBLISH (r14): the `staged` write option (or the
  * `write.wap.staged` table property, for SQL DML) lands a commit as a
  * STAGED snapshot — numbered in the chain, carrying its published
  * parent, invisible to every current-read surface — which an auditor
  * reads via `VERSION AS OF` and `CALL publish` re-applies as a
  * published delta. Pins: invisibility across reads/DVs/timeline,
  * audit readability, delta re-application over later published work,
  * loud conflict refusal, retention protection of the published head. */
class WapSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("wap-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_wap").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`")
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append() // published v1
    (tbl, s"$root/t")
  }

  private def keys(tbl: String, suffix: String = ""): Seq[Long] =
    spark.sql(s"SELECT k FROM $tbl $suffix ORDER BY k")
      .collect().map(_.getLong(0)).toSeq

  test("a staged append is invisible until publish; publish re-applies it over later published work") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    // invisible to the current read, the timeline, and the row estimate
    assert(keys(tbl) === Seq(1L, 2L, 3L))
    assert(JsonDocVersions.latestVersion(path) === Some(1))
    assert(JsonDocVersions.resolveAt(path, System.currentTimeMillis() + 1000L)
      === Some(1), "TIMESTAMP AS OF must skip staged snapshots")
    // ... but the audit read sees it, and #history flags it
    assert(keys(tbl, "VERSION AS OF 2") === Seq(1L, 2L, 3L, 4L))
    val hist = spark.sql(
      s"SELECT version, op, staged FROM graftcat.`$path#history` ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(hist === Seq((1L, "append", false), (2L, "append", true)))
    // published work lands meanwhile — the staged delta must survive it
    Seq((5L, 50.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // published v3
    assert(keys(tbl) === Seq(1L, 2L, 3L, 5L))
    val pub = spark.sql(s"CALL graftcat.publish('$path', 2)").collect()(0).getLong(0)
    assert(pub === 4L)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L))
    // publishing twice is REFUSED outright (advice r14): immediately it
    // would be a no-op, but after an OPTIMIZE retired the published
    // copies it would silently re-add the compacted-away inputs — so
    // the published marker makes any second publish loud.
    val dup = intercept[Exception] { spark.sql(s"CALL graftcat.publish('$path', 2)") }
    assert(dup.getMessage.contains("already published"), dup.getMessage)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("re-publish after OPTIMIZE is refused — the duplication scenario the marker exists for") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    spark.sql(s"CALL graftcat.publish('$path', 2)") // published v3
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L))
    // OPTIMIZE retires the published copies of the staged files
    GraftCatalog.optimize(path, targetBytes = 1L << 20)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L))
    val e = intercept[Exception] { GraftCatalog.publish(path, 2) }
    assert(e.getMessage.contains("already published"), e.getMessage)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L),
      "a refused re-publish must not duplicate the compacted-away rows")
  }

  test("a refused (conflicting) publish releases its claim — retry after re-staging works") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    assert(!JsonDocVersions.isPublished(path, 2))
    spark.sql(s"CALL graftcat.publish('$path', 2)")
    assert(JsonDocVersions.isPublished(path, 2))
  }

  test("publish carries the staged chain's transaction ledger into published state") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    // a staged batch write carrying an idempotence epoch (the GraftTxn
    // channel a checkpointed applier uses)
    GraftTxn.begin(path, "mv_app", 7L)
    try Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    finally GraftTxn.clear(path)
    assert(JsonDocVersions.lastTxn(path, "mv_app").isEmpty,
      "a staged epoch must be invisible to the published ledger until publish")
    spark.sql(s"CALL graftcat.publish('$path', 2)")
    assert(JsonDocVersions.lastTxn(path, "mv_app") === Some(7L),
      "publish must fold the staged chain's txn entries into published state " +
        "(advice r14) — else a replayed epoch re-applies instead of skipping")
  }

  test("a staged SQL DML via the table property: MOR delete invisible, then published") {
    val (tbl, path) = freshTable()
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
      "('write.rowlevel.mode' = 'merge-on-read', 'write.wap.staged' = 'true')")
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // staged v2, DV only
    assert(keys(tbl) === Seq(1L, 2L, 3L), "staged DVs must not fold into current reads")
    assert(keys(tbl, "VERSION AS OF 2") === Seq(1L, 3L))
    spark.sql(s"CALL graftcat.publish('$path', 2)")
    assert(keys(tbl) === Seq(1L, 3L))
  }

  test("publish refuses when the staged delta conflicts with a published rewrite") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    // staged overwrite (truncate) retires the whole published base
    Seq((9L, 90.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").overwrite(
        org.apache.spark.sql.functions.lit(true)) // staged v2
    assert(keys(tbl) === Seq(1L, 2L, 3L))
    // a published COW delete rewrites the base file the stage retired
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // published v3
    val e = intercept[Exception] { GraftCatalog.publish(path, 2) }
    assert(e.getMessage.contains("no longer live"),
      s"conflicting publish must refuse loudly, got: ${e.getMessage}")
    assert(keys(tbl) === Seq(1L, 3L), "a refused publish must change nothing")
  }

  test("discard_staged drops an unpublished stage; vacuum then sweeps its files") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    val stagedFiles = JsonDocVersions.read(path, 2).get --
      JsonDocVersions.read(path, 1).get
    assert(stagedFiles.nonEmpty)
    spark.sql(s"CALL graftcat.discard_staged('$path', 2)")
    val e = intercept[Exception] { keys(tbl, "VERSION AS OF 2") }
    assert(e.getMessage.contains("does not exist") || e.getMessage.contains("vacuumed"))
    GraftCatalog.vacuum(path, keepLast = 1)
    stagedFiles.foreach { f =>
      assert(!new java.io.File(path, f).isFile, s"discarded staged file $f must be swept")
    }
    assert(keys(tbl) === Seq(1L, 2L, 3L))
    // published history is never discardable through this door
    val pub = intercept[Exception] { GraftCatalog.discardStaged(path, 1) }
    assert(pub.getMessage.contains("not a staged snapshot"))
  }

  test("a checkpointed streaming consumer delivers a published stage exactly once, never sees it staged") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    val ck = java.nio.file.Files.createTempDirectory("wap_src_ck").toString
    val outRows = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-jsondoc").option("path", path).load()
        .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          outRows.synchronized { outRows ++= df.select("k").collect().map(_.getLong(0)) }
          ()
        }.option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // consumes the published base (v1)
    assert(outRows.sorted === Seq(1L, 2L, 3L))
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    drain() // staged head: NOTHING new delivered, no abort
    assert(outRows.sorted === Seq(1L, 2L, 3L), "a staged snapshot must be invisible to the source")
    spark.sql(s"CALL graftcat.publish('$path', 2)") // v3
    drain() // the published delta is an ordinary append: once, exactly
    assert(outRows.sorted === Seq(1L, 2L, 3L, 4L),
      "a published stage must deliver its rows exactly once")
  }

  test("rollback to a staged snapshot is refused — publish is the only door in") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    Seq((5L, 50.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append() // published v3
    val e = intercept[Exception] { GraftCatalog.rollback(path, 2) }
    assert(e.getMessage.contains("staged snapshot"), e.getMessage)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 5L), "a refused rollback must change nothing")
  }

  test("retention never reclaims the published head under a staged head; streaming refuses staged") {
    val (tbl, path) = freshTable()
    import spark.implicits._
    Seq((4L, 40.0)).toDF("k", "v").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2 = max manifest
    GraftCatalog.vacuum(path, keepLast = 1)
    // keep-last-1 would keep only the staged head; the published v1
    // must survive or every current read breaks
    assert(keys(tbl) === Seq(1L, 2L, 3L))
    assert(keys(tbl, "VERSION AS OF 2") === Seq(1L, 2L, 3L, 4L))
    // a staged streaming sink is refused at analysis, never half-staged
    val e = intercept[Exception] {
      val src = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("value AS k", "CAST(value AS DOUBLE) AS v")
      val q = src.writeStream.format("graft-jsondoc")
        .option("path", path).option("staged", "true")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("wap_ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage != null)
  }
}
