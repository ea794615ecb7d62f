package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** MERGE-ON-READ row-level DML (r14, the r13 verdict's top item):
  * `write.rowlevel.mode = merge-on-read` plans WriteDelta over
  * [[JsonDocDeltaOperation]] — per-file delete vectors +
  * ordinary insert files, no data file rewritten — where the default
  * plans copy-on-write ReplaceData. Pins the core MOR contract (data
  * files PHYSICALLY untouched), the fold on every read path (scan, agg
  * pushdown, metadata tables), time travel across DV versions, vacuum
  * of superseded DVs, and OPTIMIZE's purge-on-compact. q189 carries the
  * corpus-scale oracle check (q85's SQL verbatim through the MOR path). */
class MergeOnReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("merge-on-read-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshMorTable(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_mor").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE, src STRING) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    import spark.implicits._
    // two single-task appends -> two data files with known contents
    Seq((1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base"))
      .toDF("k", "v", "src").coalesce(1).writeTo(tbl).append()
    Seq((4L, 40.0, "base"), (5L, 50.0, "base")).toDF("k", "v", "src")
      .coalesce(1).writeTo(tbl).append()
    (tbl, s"$root/t")
  }

  private def rowsOf(tbl: String): Seq[(Long, Double, String)] =
    spark.sql(s"SELECT k, v, src FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq

  private def dataFileState(path: String): Map[String, (Long, String)] =
    JsonDocSource.walkDataFiles(path).map { f =>
      f.getName -> ((f.lastModified(),
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    }.toMap

  test("MOR MERGE: correct answer, WriteDelta plan, data files physically untouched") {
    val (tbl, path) = freshMorTable()
    import spark.implicits._
    val before = dataFileState(path)
    Seq((2L, "upd", 99.0), (3L, "del", 0.0), (7L, "ins", 70.0))
      .toDF("k", "op", "nv").createOrReplaceTempView("mor_changes")
    val merge =
      s"""MERGE INTO $tbl t USING mor_changes c ON t.k = c.k
         |WHEN MATCHED AND c.op = 'del' THEN DELETE
         |WHEN MATCHED AND c.op = 'upd' THEN UPDATE SET v = c.nv, src = 'upd'
         |WHEN NOT MATCHED AND c.op = 'ins' THEN INSERT (k, v, src) VALUES (c.k, c.nv, 'ins')""".stripMargin
    // the plan is the DELTA shape, not the group-based rewrite
    val planned = spark.sessionState.executePlan(
      spark.sessionState.sqlParser.parsePlan(merge)).optimizedPlan.toString()
    assert(planned.contains("WriteDelta"),
      s"merge-on-read must plan WriteDelta, got:\n$planned")
    assert(!planned.contains("ReplaceData"))
    spark.sql(merge)
    assert(rowsOf(tbl) === Seq((1L, 10.0, "base"), (2L, 99.0, "upd"),
      (4L, 40.0, "base"), (5L, 50.0, "base"), (7L, 70.0, "ins")))
    // THE merge-on-read contract: every pre-merge data file is bitwise
    // untouched — same names, same bytes, same mtimes; the delta landed
    // as delete vectors + new insert files only
    val after = dataFileState(path)
    before.foreach { case (name, state) =>
      assert(after.get(name).contains(state), s"data file $name was modified by a MOR merge")
    }
    assert((after.keySet -- before.keySet).nonEmpty, "the update/insert rows need new files")
    assert(JsonDocVersions.dvsFor(path + "", None).nonEmpty,
      "the deletes must be recorded as delete vectors")
  }

  test("MOR UPDATE and DELETE; repeated deletes union into one DV per file") {
    val (tbl, path) = freshMorTable()
    spark.sql(s"UPDATE $tbl SET v = v * 2.0 WHERE k >= 4")
    assert(rowsOf(tbl) === Seq((1L, 10.0, "base"), (2L, 20.0, "base"),
      (3L, 30.0, "base"), (4L, 80.0, "base"), (5L, 100.0, "base")))
    spark.sql(s"DELETE FROM $tbl WHERE k = 1")
    spark.sql(s"DELETE FROM $tbl WHERE k = 3")
    assert(rowsOf(tbl) === Seq((2L, 20.0, "base"), (4L, 80.0, "base"), (5L, 100.0, "base")))
    // both deletes hit the same original file: its DV is the UNION
    val dvs = JsonDocVersions.dvsFor(path, None)
    val firstFile = dvs.keys.find(_.contains("p00000")).getOrElse(dvs.keys.head)
    val positions = JsonDocDeleteVectors.read(path, dvs(firstFile))
    assert(positions.size >= 2, s"expected unioned positions, got $positions")
  }

  test("DV fold reaches every read path: agg pushdown, numRows, #files, #history, #partitions") {
    val (tbl, path) = freshMorTable()
    spark.sql(s"DELETE FROM $tbl WHERE k IN (2, 4)")
    // pushed COUNT/MIN/MAX run on the folding reader
    val agg = spark.sql(s"SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM $tbl").collect()(0)
    assert((agg.getLong(0), agg.getLong(1), agg.getLong(2)) === ((3L, 1L, 5L)))
    // exact numRows statistic subtracts DV counts
    val stats = spark.table(tbl).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(3)), s"numRows must be DV-exact, got ${stats.rowCount}")
    // metadata tables report LIVE rows
    val files = spark.sql(s"SELECT sum(n_rows) FROM graftcat.`$path#files`").collect()(0).getLong(0)
    assert(files === 3L)
    val hist = spark.sql(s"SELECT n_rows FROM graftcat.`$path#history` ORDER BY version")
      .collect().map(_.getLong(0)).toSeq
    assert(hist === Seq(3L, 5L, 3L), s"history must be per-version DV-exact, got $hist")
    val parts = spark.sql(s"SELECT sum(n_rows) FROM graftcat.`$path#partitions`").collect()(0).getLong(0)
    assert(parts === 3L)
    // #files exposes per-file deleted counts — the compact-me signal
    val del = spark.sql(s"SELECT sum(n_deleted) FROM graftcat.`$path#files`")
      .collect()(0).getLong(0)
    assert(del === 2L, s"two rows were MOR-deleted, #files reports $del")
  }

  test("time travel reads each version's own deletion state; vacuum reclaims superseded DVs") {
    val (tbl, path) = freshMorTable()
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // v3 (two appends before)
    spark.sql(s"DELETE FROM $tbl WHERE k = 4") // v4 — second file's first DV
    spark.sql(s"DELETE FROM $tbl WHERE k = 5") // v5 — SUPERSEDES it (union DV)
    assert(spark.sql(s"SELECT k FROM $tbl VERSION AS OF 2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(spark.sql(s"SELECT k FROM $tbl VERSION AS OF 3 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L, 5L))
    assert(spark.sql(s"SELECT k FROM $tbl VERSION AS OF 4 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 5L))
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    def dvFilesOnDisk(): Set[String] =
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.startsWith("_dv-")).map(_.getName).toSet
    // an untouched file's DV entry is CARRIED, not rewritten: v3 wrote
    // file 1's DV, v4 file 2's first, v5 the union DV superseding it
    val allDvs = dvFilesOnDisk()
    assert(allDvs.size == 3, s"expected 3 DV files on disk, got $allDvs")
    // vacuum to the latest version only: v4's superseded DV is orphaned
    // and reclaimed, the current two survive
    GraftCatalog.vacuum(path, keepLast = 1)
    val kept = dvFilesOnDisk()
    assert(kept === JsonDocVersions.dvsFor(path, None).values.toSet && kept.size == 2,
      s"exactly the referenced DVs must survive vacuum, got $kept")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
  }

  test("OPTIMIZE purges delete vectors: compacted output is clean, counts stay exact") {
    val (tbl, path) = freshMorTable()
    spark.sql(s"DELETE FROM $tbl WHERE k IN (1, 4)")
    assert(JsonDocVersions.dvsFor(path, None).size === 2)
    val v = GraftCatalog.optimize(path)
    assert(v.isDefined, "two small files plus insert files must compact")
    // the deletes are baked into the compacted bytes; no DV survives
    assert(JsonDocVersions.dvsFor(path, None).isEmpty,
      "compaction must purge the delete vectors")
    assert(rowsOf(tbl) === Seq((2L, 20.0, "base"), (3L, 30.0, "base"), (5L, 50.0, "base")))
    // sidecar rows of the compacted output subtracted the purged rows
    val files = spark.sql(s"SELECT sum(n_rows) FROM graftcat.`$path#files`").collect()(0).getLong(0)
    assert(files === 3L)
  }

  test("OPTIMIZE rewrites a WELL-SIZED file to purge its DV; clean files stay untouched") {
    val (tbl, path) = freshMorTable()
    spark.sql(s"DELETE FROM $tbl WHERE k = 1") // DV on file 1 only
    val cleanBefore = JsonDocVersions.latest(path).get._2
      .filter(n => JsonDocVersions.dvsFor(path, None).get(n).isEmpty)
    // targetBytes=1: every file is a singleton "big enough already" bin,
    // so without the DV-purge rule nothing would compact at all
    val v = GraftCatalog.optimize(path, targetBytes = 1L)
    assert(v.isDefined, "a singleton bin carrying a delete vector must be rewritten")
    assert(JsonDocVersions.dvsFor(path, None).isEmpty,
      "the purge-rewrite must drop the delete vector")
    val liveAfter = JsonDocVersions.latest(path).get._2
    assert(cleanBefore.subsetOf(liveAfter), "clean well-sized files must stay untouched")
    // provenance: the purge is recorded as a single-input purged rewrite,
    // so a checkpointed consumer's rebase sees exactly what happened
    val rw = JsonDocVersions.readRewrites(path, v.get)
    assert(rw.size === 1 && rw.values.head.purged && rw.values.head.from.size === 1)
    assert(rowsOf(tbl) === Seq((2L, 20.0, "base"), (3L, 30.0, "base"),
      (4L, 40.0, "base"), (5L, 50.0, "base")))
    // exact-row accounting survived the purge
    val files = spark.sql(s"SELECT sum(n_rows) FROM graftcat.`$path#files`").collect()(0).getLong(0)
    assert(files === 4L)
  }

  test("the _pos metadata column is absolute and stable under filters") {
    val (tbl, _) = freshMorTable()
    val got = spark.sql(s"SELECT k, _pos FROM $tbl WHERE k IN (2, 3, 5)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // first file holds k=1,2,3 at positions 0,1,2; second k=4,5 at 0,1
    assert(got === Map(2L -> 1L, 3L -> 2L, 5L -> 1L))
  }

  test("MOR DML on a legacy manifest-less directory bootstraps the first manifest from the listing") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_mor_legacy").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE, src STRING) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    // hand-staged data, NO manifest (a foreign writer's directory)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/t", "legacy.jsonl"),
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
        .map { case (k, v) => s"""{"k":$k,"v":$v,"src":"base"}""" }.mkString("\n"))
    spark.sql(s"DELETE FROM $tbl WHERE k = 2")
    assert(rowsOf(tbl) === Seq((1L, 10.0, "base"), (3L, 30.0, "base")))
    val (v, live) = JsonDocVersions.latest(s"$root/t").get
    assert(live === Set("legacy.jsonl"),
      s"the bootstrap manifest must name the legacy file, got v$v = $live")
    assert(JsonDocVersions.dvsFor(s"$root/t", None).keySet === Set("legacy.jsonl"))
  }

  test("MOR on a PARTITIONED table: inserts route per directory; an update moves its row across partitions") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_mor_part").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING, v DOUBLE) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang) " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    import spark.implicits._
    Seq((1L, "en", 10.0), (2L, "en", 20.0), (3L, "de", 30.0))
      .toDF("k", "lang", "v").coalesce(1).writeTo(tbl).append()
    val before = dataFileState(root + "/t")
    // UPDATE that changes the PARTITION VALUE: as delete+insert, the row
    // must physically MOVE directories (a DV in lang=en, a new file in
    // lang=fr) — the case representUpdateAsDeleteAndInsert exists for
    Seq((2L, "upd-move"), (9L, "ins")).toDF("k", "op").createOrReplaceTempView("morp_changes")
    spark.sql(
      s"""MERGE INTO $tbl t USING morp_changes c ON t.k = c.k
         |WHEN MATCHED AND c.op = 'upd-move' THEN UPDATE SET lang = 'fr', v = t.v + 1.0
         |WHEN NOT MATCHED THEN INSERT (k, lang, v) VALUES (c.k, 'de', 99.0)""".stripMargin)
    assert(spark.sql(s"SELECT k, lang, v FROM $tbl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      === Seq((1L, "en", 10.0), (2L, "fr", 21.0), (3L, "de", 30.0), (9L, "de", 99.0)))
    // pre-merge data files bitwise untouched; the moved/inserted rows
    // landed as NEW files in their target directories + a DV on lang=en
    val after = dataFileState(root + "/t")
    before.foreach { case (n, st) =>
      assert(after.get(n).contains(st), s"data file $n was modified by a partitioned MOR merge")
    }
    val dvs = JsonDocVersions.dvsFor(root + "/t", None)
    assert(dvs.keySet.forall(_.startsWith("lang=en/")), s"the delete vector targets lang=en, got $dvs")
    val live = JsonDocVersions.latest(root + "/t").get._2
    assert(live.exists(_.startsWith("lang=fr/")), s"the moved row needs a lang=fr file, got $live")
    // partition pruning still agrees with the fold: lang=en has ONE
    // surviving row, read without touching fr/de directories
    val planned = spark.sql(s"SELECT k FROM $tbl WHERE lang = 'en'")
      .queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.inputPartitions.map(_.asInstanceOf[JsonDocPartition].file)
    assert(planned.forall(_.contains("/lang=en/")), planned.toSeq)
    assert(spark.sql(s"SELECT k FROM $tbl WHERE lang = 'en'").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("a MOR DELETE under a checkpointed streaming consumer aborts loudly") {
    import org.apache.spark.sql.types._
    val (tbl, path) = freshMorTable()
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType), StructField("src", StringType)))
    val stream = new JsonDocMicroBatchStream(schema, path, Array.empty)
    val end = stream.latestOffset() // consumes the current snapshot basis
    stream.planInputPartitions(stream.initialOffset(), end)
    spark.sql(s"DELETE FROM $tbl WHERE k = 2") // repoints a DV under the consumer
    val e = intercept[IllegalStateException] { stream.latestOffset() }
    assert(e.getMessage.contains("merge-on-read"), e.getMessage)
  }
}
