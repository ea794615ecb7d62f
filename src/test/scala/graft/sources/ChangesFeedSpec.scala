package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ROW-LEVEL CHANGE DATA FEED (r15, [[JsonDocChangesTable]]): `#changes`
  * computed on demand from the snapshot lineage — no stored change
  * files. Pins the per-commit row semantics for every mutation path
  * (append, MOR delete/update via DV growth, COW rewrite, equality-
  * delete upsert epochs, rollback resurrection), the identity-op skip
  * (OPTIMIZE emits nothing), staged-snapshot invisibility, bounded
  * ranges, and the master invariant: bag-folding the feed (+1 insert /
  * −1 delete on row content) reproduces the live table exactly. */
class ChangesFeedSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("changes-feed-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val MetaCols = Set("_change_type", "_commit_version", "_commit_ms")

  private def fresh(mor: Boolean): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_cdf").toString
    val tbl = s"graftcat.`$root/t`"
    val props = if (mor)
      " TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')" else ""
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE, src STRING) " +
      s"USING `graft-jsondoc`$props")
    (tbl, s"$root/t")
  }

  private def feed(path: String, start: Option[Int] = None,
      end: Option[Int] = None): DataFrame = {
    var r = spark.read.format("graft-jsondoc").option("readChanges", "true")
    start.foreach(s => r = r.option("startingVersion", s.toString))
    end.foreach(e => r = r.option("endingVersion", e.toString))
    r.option("path", path).load()
  }

  /** The changelog contract: folding the full feed as a bag (+1 per
    * insert, −1 per delete on row CONTENT) must reproduce the live
    * table's bag of rows exactly. */
  private def assertFoldsToTable(path: String, tbl: String): Unit = {
    val f = feed(path)
    val dataCols = f.columns.filterNot(MetaCols).toSeq
    val folded = f.groupBy(dataCols.map(col): _*)
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("n"))
      .filter(col("n") =!= 0L)
    val table = spark.sql(s"SELECT * FROM $tbl")
      .groupBy(dataCols.map(col): _*).agg(count(lit(1)).as("n"))
    assert(folded.exceptAll(table).isEmpty && table.exceptAll(folded).isEmpty,
      s"feed fold does not reproduce the table for $path")
  }

  private def rowsAt(path: String, v: Long,
      changeType: String): Seq[(Long, Double, String)] =
    feed(path).filter(col("_commit_version") === v &&
        col("_change_type") === changeType)
      .select("k", "v", "src").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq.sorted

  test("append + MOR delete/update emit exact row-level changes; OPTIMIZE emits none") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base"))
      .toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((4L, 40.0, "base"), (5L, 50.0, "base")).toDF("k", "v", "src")
      .coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // v3: DV growth
    spark.sql(s"UPDATE $tbl SET v = 300.0, src = 'upd' WHERE k = 3") // v4
    spark.sql(s"CALL graftcat.optimize('$path', ${32 * 1024 * 1024})") // v5: identity

    assert(rowsAt(path, 1L, "insert") ===
      Seq((1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base")))
    assert(rowsAt(path, 2L, "insert") === Seq((4L, 40.0, "base"), (5L, 50.0, "base")))
    assert(rowsAt(path, 3L, "delete") === Seq((2L, 20.0, "base")))
    // MOR update = delete(old image) + insert(new image), same commit
    assert(rowsAt(path, 4L, "delete") === Seq((3L, 30.0, "base")))
    assert(rowsAt(path, 4L, "insert") === Seq((3L, 300.0, "upd")))
    assert(feed(path).filter(col("_commit_version") === 5L).isEmpty,
      "OPTIMIZE is a logical identity and must emit no feed rows")
    assertFoldsToTable(path, tbl)
  }

  test("copy-on-write commits fold correctly; unchanged rows cancel as delete+insert pairs") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base"))
      .toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // v2: COW rewrite of the file
    // raw feed at v2: the whole rewritten file both ways
    assert(rowsAt(path, 2L, "delete") ===
      Seq((1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base")))
    assert(rowsAt(path, 2L, "insert") === Seq((1L, 10.0, "base"), (3L, 30.0, "base")))
    // the net of the commit is exactly the deleted row
    val net = feed(path).filter(col("_commit_version") === 2L)
      .groupBy("k", "v", "src")
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L)).as("n"))
      .filter(col("n") =!= 0L).select("k").as[Long].collect().toSeq
    assert(net === Seq(2L))
    assertFoldsToTable(path, tbl)
  }

  test("equality-delete upsert epoch: old images delete, the epoch's own inserts survive its set") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base"))
      .toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    // one CDC epoch through the streaming upsert sink: update k=1,
    // delete k=2, insert k=9
    val staging = path + "_staging"
    Seq((1L, 100.0, "upd", "U"), (2L, 20.0, "base", "D"), (9L, 90.0, "ins", "I"))
      .toDF("k", "v", "src", "_op").coalesce(1)
      .write.format("graft-jsondoc").option("path", staging).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_op", org.apache.spark.sql.types.StringType)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_ck").toString
    val q = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", staging).load()
      .writeStream.format("graft-jsondoc")
      .option("path", path).option("checkpointLocation", ckpt)
      .option("upsert-keys", "k").option("upsert-cdc-col", "_op")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val vE = JsonDocVersions.latestVersion(path).get.toLong

    // the epoch's eq set hits the OLD images of k=1 and k=2 only — the
    // epoch's own inserts are newer than the set and must not fold
    assert(rowsAt(path, vE, "delete") === Seq((1L, 10.0, "base"), (2L, 20.0, "base")))
    assert(rowsAt(path, vE, "insert") === Seq((1L, 100.0, "upd"), (9L, 90.0, "ins")))
    assertFoldsToTable(path, tbl)
  }

  test("bounded ranges, the catalog #changes table, and VERSION AS OF end bound") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v3

    assert(feed(path).count() === 3)
    assert(feed(path, start = Some(2)).select("_commit_version")
      .as[Long].collect().toSet === Set(2L, 3L))
    assert(feed(path, start = Some(2), end = Some(2))
      .select("k").as[Long].collect().toSeq === Seq(2L))
    // endingVersion beyond the published head fails loudly
    val e = intercept[Exception] { feed(path, end = Some(99)).collect() }
    assert(e.getMessage.contains("beyond the latest published"))
    // catalog surface: full feed, and SQL's version slot as the end bound
    assert(spark.sql(s"SELECT * FROM graftcat.`$path#changes`").count() === 3)
    assert(spark.sql(s"SELECT * FROM graftcat.`$path#changes` VERSION AS OF 2")
      .count() === 2)
  }

  test("staged snapshots are invisible until publish; the publish commit carries their delta") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "wap")).toDF("k", "v", "src").coalesce(1)
      .writeTo(tbl).option("staged", "true").append() // staged v2
    assert(feed(path).select("k").as[Long].collect().toSeq === Seq(1L),
      "a staged snapshot must not reach the change feed")
    val vPub = spark.sql(s"CALL graftcat.publish('$path', 2)").collect()(0).getLong(0)
    val pubRows = rowsAt(path, vPub, "insert")
    assert(pubRows === Seq((2L, 20.0, "wap")))
    assertFoldsToTable(path, tbl)
  }

  private def runCdfStream(path: String, ckpt: String, outDir: String): Unit = {
    val q = spark.readStream.format("graft-jsondoc")
      .option("readChanges", "true").option("path", path).load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("streaming change feed: versions as offsets, exactly-once across restart, DML allowed") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a"), (2L, 20.0, "a")).toDF("k", "v", "src")
      .coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // v2 — aborts the plain stream,
                                               // delivered here as a delete row
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_stream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cdf_out").toString
    runCdfStream(path, ckpt, outDir)
    val got1 = spark.read.parquet(outDir)
      .select("_change_type", "_commit_version", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(got1 === Seq(("delete", 2L, 1L), ("insert", 1L, 1L), ("insert", 1L, 2L)))

    // new commits land; the restarted consumer delivers ONLY them
    // (the sink accumulates — the delta is the restarted run's delivery)
    Seq((3L, 30.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v3
    spark.sql(s"UPDATE $tbl SET v = 200.0, src = 'upd' WHERE k = 2") // v4
    runCdfStream(path, ckpt, outDir)
    val got2 = spark.read.parquet(outDir)
      .select("_change_type", "_commit_version", "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sorted
    assert(got2 === Seq(("delete", 2L, 1L, 10.0), ("delete", 4L, 2L, 20.0),
      ("insert", 1L, 1L, 10.0), ("insert", 1L, 2L, 20.0),
      ("insert", 3L, 3L, 30.0), ("insert", 4L, 2L, 200.0)),
      "the restarted consumer must deliver exactly the new commits, once")
  }

  test("streaming change feed delivers equality-delete epochs the append-only stream must refuse") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "base"), (2L, 20.0, "base")).toDF("k", "v", "src")
      .coalesce(1).writeTo(tbl).append() // v1
    // one upsert epoch (update k=1) — leaves a live equality delete
    val staging = path + "_staging"
    Seq((1L, 100.0, "upd", "U")).toDF("k", "v", "src", "_op").coalesce(1)
      .write.format("graft-jsondoc").option("path", staging).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_op", org.apache.spark.sql.types.StringType)))
    val upCkpt = java.nio.file.Files.createTempDirectory("graft_cdf_up").toString
    val up = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", staging).load()
      .writeStream.format("graft-jsondoc")
      .option("path", path).option("checkpointLocation", upCkpt)
      .option("upsert-keys", "k").option("upsert-cdc-col", "_op")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    up.awaitTermination()

    // the append-only consumer refuses the table (eq deletes break
    // file-granular offsets) ...
    val plainCkpt = java.nio.file.Files.createTempDirectory("graft_cdf_plain").toString
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-jsondoc")
        .schema(org.apache.spark.sql.types.StructType(schema.dropRight(1)))
        .option("path", path).load()
        .writeStream.format("memory").queryName("cdf_plain_sink")
        .option("checkpointLocation", plainCkpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("equality") ||
      Option(e.getCause).exists(_.getMessage.contains("equality")))

    // ... while the CDC stream delivers the epoch as explicit rows
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_eqs").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cdf_eqout").toString
    runCdfStream(path, ckpt, outDir)
    val got = spark.read.parquet(outDir).select("_change_type", "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    assert(got === Seq(("delete", 1L, 10.0), ("insert", 1L, 10.0),
      ("insert", 1L, 100.0), ("insert", 2L, 20.0)))
  }

  test("feed work is proportional to CHANGED files: one touched file = one task, untouched files unplanned") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    // ten single-row appends -> ten data files (v1..v10)
    for (i <- 1 to 10)
      Seq((i.toLong, i * 10.0, "base")).toDF("k", "v", "src")
        .coalesce(1).writeTo(tbl).append()
    spark.sql(s"DELETE FROM $tbl WHERE k = 4") // v11: DV on ONE file
    val schema = GraftCatalog.readSchema(new java.io.File(path)).get
    val scan = new JsonDocChangesScan(path, schema, Some(11), Some(11))
    val parts = scan.planInputPartitions()
    assert(parts.length === 1,
      s"a one-file commit must plan exactly one feed task, got ${parts.length}")
    val p = parts(0).asInstanceOf[JsonDocChangesPartition]
    assert(p.changeType === "delete" && p.keepPos === Some(Seq(0L)))
  }

  test("pushed _commit_version filters prune whole commits at planning; rows stay exact") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    Seq((3L, 30.0, "c")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v3

    val schema = GraftCatalog.readSchema(new java.io.File(path)).get
    val b = new JsonDocChangesScanBuilder(path, schema, None, None)
    val residual = b.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("_commit_version", 3L)))
    assert(residual.length === 1, "pruning filters stay residual (conservative)")
    val parts = b.build().asInstanceOf[JsonDocChangesScan].planInputPartitions()
    assert(parts.length === 1 &&
      parts(0).asInstanceOf[JsonDocChangesPartition].commitVersion === 3L,
      "commits below the pushed bound must not be planned")

    // end-to-end through SQL: same answer with the prune in effect
    val got = spark.sql(s"SELECT k FROM graftcat.`$path#changes` " +
      "WHERE _commit_version >= 3").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L))
  }

  test("a vacuumed diff basis refuses loudly; a range above it still serves") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    Seq((3L, 30.0, "c")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v3
    GraftCatalog.vacuum(path, keepLast = 2) // v1's manifest drops
    val e = intercept[Exception] { feed(path).collect() }
    assert(e.getMessage.contains("expired/vacuumed"),
      "the earliest surviving commit lost its diff basis and must refuse")
    // bounded above the lost basis: exact as ever
    assert(feed(path, start = Some(3)).select("k")
      .as[Long].collect().toSeq === Seq(3L))
  }

  test("pushed _commit_ms bounds prune commits through their recorded times") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    val cut = JsonDocVersions.mtime(path, 2).get
    val schema = GraftCatalog.readSchema(new java.io.File(path)).get
    val b = new JsonDocChangesScanBuilder(path, schema, None, None)
    b.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("_commit_ms", cut)))
    val parts = b.build().asInstanceOf[JsonDocChangesScan].planInputPartitions()
    assert(parts.map(_.asInstanceOf[JsonDocChangesPartition].commitVersion)
      .forall(_ >= 2L), "commits older than the ms bound must not be planned")
    // end-to-end: SQL over the catalog table with the same bound
    val got = spark.sql(s"SELECT k FROM graftcat.`$path#changes` " +
      s"WHERE _commit_ms >= $cut").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L))
  }

  test("the feed reads pre-rename files under the current column names") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN src TO origin")
    Seq((2L, 20.0, "b")).toDF("k", "v", "origin").coalesce(1).writeTo(tbl).append() // v2
    val got = feed(path).select("_commit_version", "k", "origin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
    assert(got === Seq((1L, 1L, "a"), (2L, 2L, "b")),
      "the v1 file predates the rename and must still surface its value under the new name")
  }

  test("timestamp bounds resolve through commit times; mixing bound kinds refuses") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    val cut = JsonDocVersions.mtime(path, 2).get // v2's commit time
    val got = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("startingTimestamp", cut.toString).option("path", path).load()
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L), "startingTimestamp must include the commit at the cut")
    val upTo = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("endingTimestamp", (cut - 1).toString).option("path", path).load()
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(upTo === Seq(1L), "endingTimestamp keeps only commits at or before it")
    val e = intercept[Exception] {
      spark.read.format("graft-jsondoc").option("readChanges", "true")
        .option("startingVersion", "1").option("startingTimestamp", cut.toString)
        .option("path", path).load().collect()
    }
    assert(e.getMessage.contains("not both"))
  }

  test("startingVersion=latest delivers only future commits (empty batch, stream from head)") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "old")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    def latestFeed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("startingVersion", "latest").option("path", path).load()
    assert(latestFeed.isEmpty, "no commit landed after 'latest' was resolved")
    // the STREAM skips history and delivers exactly the future commits
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_latest").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cdf_latest_out").toString
    def runLatest(): Unit = {
      val q = spark.readStream.format("graft-jsondoc")
        .option("readChanges", "true").option("startingVersion", "latest")
        .option("path", path).load()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runLatest() // resolves 'latest' = v1; nothing to deliver
    Seq((2L, 20.0, "new")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    runLatest() // same checkpoint: delivers v2 only
    val got = spark.read.parquet(outDir).select("_commit_version", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 2L)), "history before 'latest' must never deliver")
  }

  test("the feed across SCHEMA EVOLUTION: rename + widen + add + drop, replay == final state") {
    // the r16 contract: the feed always emits the CURRENT data schema —
    // pre-rename rows surface under the new name (name mapping),
    // pre-widening int tokens read as the widened type, pre-add rows
    // carry NULL (or their frozen ADD COLUMN DEFAULT), and dropped
    // columns simply stop being emitted (bytes inert) — so a consumer
    // replaying the whole lineage lands exactly the final table.
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_evo").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, cnt INT, junk STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO $tbl VALUES (1, 10, 'a'), (2, 20, 'b')") // v1
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN k TO id")
    spark.sql(s"ALTER TABLE $tbl ALTER COLUMN cnt TYPE BIGINT")
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tag STRING DEFAULT 'old')")
    spark.sql(s"ALTER TABLE $tbl DROP COLUMN junk")
    spark.sql(s"INSERT INTO $tbl VALUES (3, 30, 'new')") // v2, new shape
    spark.sql(s"DELETE FROM $tbl WHERE id = 2") // v3: pre-rename row by NEW name
    val feed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("path", s"$root/t").load()
    assert(feed.columns.toSeq ===
      Seq("id", "cnt", "tag", "_change_type", "_commit_version", "_commit_ms"),
      "the feed emits the CURRENT data schema — renamed/added, dropped gone")
    assert(feed.schema("cnt").dataType === org.apache.spark.sql.types.LongType)
    val got = feed.select("_change_type", "_commit_version", "id", "cnt", "tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSet
    assert(got === Set(
      ("insert", 1L, 1L, 10L, "old"), ("insert", 1L, 2L, 20L, "old"),
      ("insert", 2L, 3L, 30L, "new"),
      ("delete", 3L, 2L, 20L, "old")),
      s"evolution-spanning feed rows drifted: $got")
    // replay (q206 idiom): latest image per key, deletes drop the key
    val replayed = spark.sql(
      s"""SELECT id, cnt, tag FROM (
         |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY
         |    _commit_version DESC,
         |    CASE WHEN _change_type = 'insert' THEN 0 ELSE 1 END) AS rn
         |  FROM graftcat.`$root/t#changes`)
         |WHERE rn = 1 AND _change_type = 'insert' ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val table = spark.sql(s"SELECT id, cnt, tag FROM $tbl ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(replayed === table, "feed replay must reconstruct the final table")
    assert(table === Seq((1L, 10L, "old"), (3L, 30L, "new")))
  }

  test("a user-declared feed schema (no metadata) still serves frozen defaults (r17 advice)") {
    // existence defaults resolve from the TABLE PATH's sidecar, not from
    // the handed-in schema's field metadata — a bare readChanges with
    // .schema(...) must emit the same pre-add values a direct read does
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_bare").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    spark.sql(s"INSERT INTO $tbl VALUES (1), (2)") // v1, pre-add
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (tag STRING DEFAULT 'old')")
    spark.sql(s"INSERT INTO $tbl VALUES (3, 'new')") // v2
    val feed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .schema("k BIGINT, tag STRING") // METADATA-FREE user schema
      .option("path", s"$root/t").load()
    val got = feed.select("_commit_version", "k", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === Set((1L, 1L, "old"), (1L, 2L, "old"), (2L, 3L, "new")),
      s"the bare-schema feed must serve the frozen default for pre-add rows: $got")
  }

  test("mis-cased reader options resolve like Spark options: case-insensitively") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    // readchanges (lowercase) must yield the FEED, not a silent snapshot
    // read with null metadata columns
    val lower = spark.read.format("graft-jsondoc").option("readchanges", "true")
      .option("STARTINGVERSION", "2").option("path", path).load()
    assert(lower.columns.contains("_change_type"))
    val got = lower.select("_change_type", "_commit_version", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("insert", 2L, 2L)),
      "a mis-cased startingVersion must bound the range, not be silently ignored")
  }

  test("explicitly inverted version ranges fail; engine-resolved 'latest' past an end is empty") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    // start = end + 1 EXPLICITLY is a user error, same as any inverted range
    val e = intercept[Exception] {
      feed(path, start = Some(2), end = Some(1)).collect()
    }
    assert(e.getMessage.contains("exceeds"),
      s"explicit start=end+1 must fail the range check, got: ${e.getMessage}")
    // but 'latest' resolving to head+1 against an explicit end = head reads
    // empty — the engine chose that bound, not the user
    val empty = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("startingVersion", "latest").option("endingVersion", "1")
      .option("path", path).load()
    assert(empty.isEmpty)
  }

  test("the feed over a PARTITIONED table: directory-resident rows change exactly") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_part").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (region STRING, k BIGINT, v DOUBLE) " +
      "USING `graft-jsondoc` PARTITIONED BY (region) " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    import spark.implicits._
    Seq(("emea", 1L, 10.0), ("emea", 2L, 20.0), ("apac", 3L, 30.0))
      .toDF("region", "k", "v").coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // v2: DV inside region=emea
    val got = feed(s"$root/t")
      .select("_change_type", "_commit_version", "region", "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq.sorted
    assert(got === Seq(("delete", 2L, "emea", 2L), ("insert", 1L, "apac", 3L),
      ("insert", 1L, "emea", 1L), ("insert", 1L, "emea", 2L)))
    assertFoldsToTable(s"$root/t", tbl)
  }

  test("cluster() is a declared layout identity and emits nothing; a real overwrite emits") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "a"))
      .toDF("k", "v", "src").repartition(3).writeTo(tbl).append() // v1, 3 files
    GraftCatalog.cluster(spark, tbl, "k", 2) // v2: content-identical rewrite
    assert(feed(path).filter(col("_commit_version") === 2L).isEmpty,
      "a clustering maintenance rewrite must not flood the feed")
    spark.sql(s"INSERT OVERWRITE $tbl VALUES (9, 90.0, 'new')") // v3: real change
    assert(feed(path).filter(col("_commit_version") === 3L).count() === 4L,
      "a truncate-replace is a content change: 3 deletes + 1 insert")
    assertFoldsToTable(path, tbl)
  }

  test("a cluster-by overwrite with CHANGED content is not an identity — only the maintenance marker skips") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "a"), (2L, 20.0, "a")).toDF("k", "v", "src")
      .coalesce(1).writeTo(tbl).append() // v1
    // a RAW cluster-by overwrite replacing the content: cluster-by is a
    // distribution request, not an identity claim — the feed must emit
    Seq((9L, 90.0, "new")).toDF("k", "v", "src")
      .writeTo(tbl).option("cluster-by", "k").option("cluster-buckets", "1")
      .overwrite(lit(true)) // v2
    val v2 = feed(path).filter(col("_commit_version") === 2L)
    assert(v2.filter(col("_change_type") === "delete").count() === 2L &&
      v2.filter(col("_change_type") === "insert").count() === 1L,
      "a content-changing cluster-by overwrite must reach the feed")
    assertFoldsToTable(path, tbl)
  }

  test("a bounded change stream stops delivering at endingVersion") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    Seq((2L, 20.0, "b")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v2
    Seq((3L, 30.0, "c")).toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v3
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_bound").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_cdf_bound_out").toString
    val q = spark.readStream.format("graft-jsondoc")
      .option("readChanges", "true").option("endingVersion", "2")
      .option("path", path).load()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(outDir).select("k")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got === Seq(1L, 2L), "commits past the end bound must never deliver")
  }

  test("rollback over an equality-delete epoch: dropped sets resurrect their matches as inserts") {
    val (tbl, path) = fresh(mor = false)
    import spark.implicits._
    Seq((1L, 10.0, "base"), (2L, 20.0, "base")).toDF("k", "v", "src")
      .coalesce(1).writeTo(tbl).append() // v1
    // upsert epoch: update k=1 (its eq set kills the old image)
    val staging = path + "_staging"
    Seq((1L, 100.0, "upd", "U")).toDF("k", "v", "src", "_op").coalesce(1)
      .write.format("graft-jsondoc").option("path", staging).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_op", org.apache.spark.sql.types.StringType)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdf_rbeq").toString
    val up = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", staging).load()
      .writeStream.format("graft-jsondoc")
      .option("path", path).option("checkpointLocation", ckpt)
      .option("upsert-keys", "k").option("upsert-cdc-col", "_op")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    up.awaitTermination()
    val vE = JsonDocVersions.latestVersion(path).get
    spark.sql(s"CALL graftcat.rollback('$path', 1)") // drops the epoch file AND its eq set
    val vR = JsonDocVersions.latestVersion(path).get.toLong
    val atR = feed(path).filter(col("_commit_version") === vR)
      .select("_change_type", "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
    // the epoch's file dies (delete of the new image) and the dropped eq
    // set resurrects the OLD image — the insert-eq partition kind
    assert(atR === Seq(("delete", 1L, 100.0), ("insert", 1L, 10.0)),
      s"rollback over an eq epoch (epoch v$vE) must resurrect exactly the old image")
    assertFoldsToTable(path, tbl)
  }

  test("rollback emits the restoring changes: resurrected positions surface as inserts") {
    val (tbl, path) = fresh(mor = true)
    import spark.implicits._
    Seq((1L, 10.0, "a"), (2L, 20.0, "a"), (3L, 30.0, "a"))
      .toDF("k", "v", "src").coalesce(1).writeTo(tbl).append() // v1
    spark.sql(s"DELETE FROM $tbl WHERE k IN (1, 2)") // v2: DV growth
    spark.sql(s"CALL graftcat.rollback('$path', 1)") // v3: DV shrink back
    assert(rowsAt(path, 3L, "insert") === Seq((1L, 10.0, "a"), (2L, 20.0, "a")))
    assert(feed(path).filter(col("_commit_version") === 3L &&
      col("_change_type") === "delete").isEmpty)
    assertFoldsToTable(path, tbl)
  }
}
