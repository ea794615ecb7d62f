package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** ROLLBACK (r14, [[GraftCatalog.rollback]]): restore the LIVE table to
  * a past snapshot as a new metadata-only commit — live set AND
  * delete-vector map verbatim, data files untouched, rolled-over
  * history preserved. q196 carries the corpus-scale oracle row. */
class RollbackSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("rollback-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(props: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_rollback").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc`$props")
    import spark.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v")
      .coalesce(1).writeTo(tbl).append() // v1
    (tbl, s"$root/t")
  }

  private def keys(tbl: String, suffix: String = ""): Seq[Long] =
    spark.sql(s"SELECT k FROM $tbl $suffix ORDER BY k")
      .collect().map(_.getLong(0)).toSeq

  test("rollback restores rows AND the exact delete-vector state of the target version") {
    val (tbl, path) = freshTable(
      " TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v2: DV {0}
    val dvsAtV2 = JsonDocVersions.readDvs(path, 2)
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // v3: DV {0,1}
    assert(keys(tbl) === Seq(3L, 4L))
    val v = spark.sql(s"CALL graftcat.rollback('$path', 2)").collect()(0).getLong(0)
    assert(v === 4L)
    // NOT v1's state (that would resurrect k=1), and NOT v3's filtered
    // to old files (that would keep k=2 dead): exactly v2's
    assert(keys(tbl) === Seq(2L, 3L, 4L))
    assert(JsonDocVersions.readDvs(path, 4) === dvsAtV2)
  }

  test("rollback is metadata-only and preserves the rolled-over history") {
    val (tbl, path) = freshTable()
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v2, copy-on-write
    val filesBefore = JsonDocSource.walkDataFiles(path)
      .map(f => f.getName -> f.lastModified()).toMap
    spark.sql(s"CALL graftcat.rollback('$path', 1)") // v3 = v1's live set
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L))
    // no data file written, moved, or touched — the commit is one manifest
    val filesAfter = JsonDocSource.walkDataFiles(path)
      .map(f => f.getName -> f.lastModified()).toMap
    assert(filesAfter === filesBefore)
    // the rolled-over bad version is still auditable via time travel
    assert(keys(tbl, "VERSION AS OF 2") === Seq(2L, 3L, 4L))
    // and the restored state survives retention (the new latest pins it)
    GraftCatalog.vacuum(path, keepLast = 1)
    assert(keys(tbl) === Seq(1L, 2L, 3L, 4L))
  }

  test("#history records the operation that minted each snapshot") {
    val (tbl, path) = freshTable(
      " TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v2
    GraftCatalog.optimize(path) // v3 (DV purge-rewrite)
    spark.sql(s"CALL graftcat.rollback('$path', 2)") // v4
    val ops = spark.sql(s"SELECT op FROM graftcat.`$path#history` ORDER BY version")
      .collect().map(_.getString(0)).toSeq
    assert(ops === Seq("append", "merge-on-read delete", "optimize", "rollback"))
    // commit times are present, sane, and non-decreasing along the chain
    val times = spark.sql(
      s"SELECT committed_ms FROM graftcat.`$path#history` ORDER BY version")
      .collect().map(_.getLong(0)).toSeq
    assert(times.length === 4 && times === times.sorted)
    assert(times.forall(t => t > 0L && t <= System.currentTimeMillis() + 1000L))
  }

  test("rollback to a missing/expired version refuses loudly") {
    val (_, path) = freshTable()
    val e = intercept[IllegalArgumentException] { GraftCatalog.rollback(path, 99) }
    assert(e.getMessage.contains("no such committed"))
  }
}
