package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Identity-partitioned catalog tables (r13): Hive-style `col=value`
  * directory layout, partition pruning at plan time before the stats
  * sidecar, the full DDL/DML surface on top. */
class PartitionedTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_part").toString
    (s"$root/t", s"graftcat.`$root/t`")
  }

  private def seed(tbl: String): Unit = {
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING, n BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang)")
    Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L), (4L, "fr", 40L))
      .toDF("k", "lang", "n").coalesce(1).writeTo(tbl).append()
  }

  private def msgs(t: Throwable): Seq[String] =
    if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)

  test("writes route to col=value directories; reads see every partition") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq === Seq("lang=de", "lang=en", "lang=fr"))
    // data files live ONLY inside partition dirs; rows are self-contained
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")))
    assert(spark.sql(s"SELECT k, lang, n FROM $tbl ORDER BY k").collect().map(_.toSeq).toSeq
      === Seq(Seq(1L, "en", 10L), Seq(2L, "de", 20L), Seq(3L, "en", 30L), Seq(4L, "fr", 40L)))
    // `_file` reports the RELATIVE path — partition dir included
    val files = spark.sql(s"SELECT DISTINCT _file FROM $tbl WHERE lang = 'en'")
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.startsWith("lang=en/")), files.toSeq)
  }

  test("r17: native SHOW PARTITIONS and ALTER TABLE DROP PARTITION") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    // SHOW PARTITIONS lists the live layout in directory coordinates
    assert(spark.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0)).sorted
      === Array("lang=de", "lang=en", "lang=fr"))
    // partial spec narrows
    assert(spark.sql(s"SHOW PARTITIONS $tbl PARTITION (lang='en')").collect()
      .map(_.getString(0)).toSeq === Seq("lang=en"))
    // DROP PARTITION = the q220 metadata delete scoped to one directory:
    // one commit, zero data I/O, untouched files keep their bytes
    val before = JsonDocVersions.latest(s"$dir").get._2
      .filterNot(_.startsWith("lang=en/"))
      .map(rel => rel -> java.nio.file.Files.readAllBytes(
        new java.io.File(dir, rel).toPath).toSeq).toMap
    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (lang='en')")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(2L, 4L), "en rows gone, others intact")
    assert(spark.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0)).sorted
      === Array("lang=de", "lang=fr"))
    before.foreach { case (rel, bytes) =>
      assert(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, rel).toPath).toSeq === bytes,
        s"untouched $rel must keep exact bytes")
    }
    assert(JsonDocVersions.readOp(dir, JsonDocVersions.latestManifestVersion(dir))
      .contains("drop-partition"))
    // dropping a missing partition refuses (standard IF EXISTS contract)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl DROP PARTITION (lang='xx')")
    }
    assert(e.getMessage.toLowerCase.contains("cannot be found") ||
      e.getMessage.toLowerCase.contains("not found"), e.getMessage)
    spark.sql(s"ALTER TABLE $tbl DROP IF EXISTS PARTITION (lang='xx')") // silent
    // ADD PARTITION refuses loudly: partitions derive from data
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl ADD PARTITION (lang='it')")
    }
    assert(e2.getMessage.contains("derived from data"), e2.getMessage)
  }

  test("r17: SHOW/DROP PARTITION on a days()-transformed layout uses dir coordinates") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_part_days").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, d STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (days(d))")
    Seq((1L, "2024-01-15T10:00:00"), (2L, "2024-01-15T22:00:00"),
      (3L, "2024-01-16T01:00:00"))
      .toDF("k", "d").coalesce(1).writeTo(tbl).append()
    assert(spark.sql(s"SHOW PARTITIONS $tbl").collect().map(_.getString(0)).sorted
      === Array("d_day=2024-01-15", "d_day=2024-01-16"))
    spark.sql(s"ALTER TABLE $tbl DROP PARTITION (d_day='2024-01-15')")
    assert(spark.sql(s"SELECT k FROM $tbl").collect().map(_.getLong(0)).toSeq
      === Seq(3L))
  }

  test("a partition filter prunes directories at plan time, before stats") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    // the physical proof: the planned partitions' file paths all live in
    // the matching directory (partition pruning is a plan-time listing
    // skip, not a row filter)
    val df = spark.sql(s"SELECT k FROM $tbl WHERE lang = 'en'")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    val planned = scans.head.inputPartitions.map(
      _.asInstanceOf[JsonDocPartition].file)
    assert(planned.nonEmpty && planned.forall(_.contains("/lang=en/")),
      s"partition pruning must keep only lang=en files, planned: ${planned.toSeq}")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    // range + In shapes prune through the same compiled pruner
    val dfIn = spark.sql(s"SELECT k FROM $tbl WHERE lang IN ('de', 'fr')")
    val plannedIn = dfIn.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.map(_.asInstanceOf[JsonDocPartition].file)
    assert(plannedIn.forall(f => f.contains("/lang=de/") || f.contains("/lang=fr/")))
    assert(dfIn.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 4L))
  }

  test("row-level DML rewrites only the touched partition's files") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    def fileSnapshot(): Map[String, Long] =
      JsonDocSource.listDataFiles(dir)
        .map(f => JsonDocSource.relName(dir, f) -> f.lastModified()).toMap
    val before = fileSnapshot()
    spark.sql(s"DELETE FROM $tbl WHERE lang = 'en' AND k = 1")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(2L, 3L, 4L))
    val after = fileSnapshot()
    // de/fr files physically untouched (file-granular copy-on-write)
    before.filter(e => !e._1.startsWith("lang=en/")).foreach { case (n, m) =>
      assert(after.get(n).contains(m), s"untouched partition file rewritten: $n")
    }
    // the rewritten en file still lives under lang=en/
    assert(after.keys.filterNot(before.keySet).forall(_.startsWith("lang=en/")),
      s"rewrite must stay in its partition: ${after.keys.toSeq}")
  }

  test("OPTIMIZE bins never straddle a partition directory") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING, n BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang)")
    // several small appends per partition -> many compactable files
    (0 until 3).foreach { r =>
      Seq((r * 2L, "en", 1L), (r * 2 + 1L, "de", 2L))
        .toDF("k", "lang", "n").coalesce(1).writeTo(tbl).append()
    }
    val v = GraftCatalog.optimize(dir, targetBytes = 1L << 20)
    assert(v.isDefined)
    val live = JsonDocSource.listDataFiles(dir)
      .map(f => JsonDocSource.relName(dir, f)).toSeq
    // each partition compacted into its own file, in its own directory
    assert(live.count(_.startsWith("lang=en/compact-")) == 1, live)
    assert(live.count(_.startsWith("lang=de/compact-")) == 1, live)
    assert(live.size == 2, live)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 6L)
    // #files reports relative paths with exact merged counts
    val inv = spark.sql(s"SELECT file, n_rows FROM graftcat.`$dir#files` ORDER BY file")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(inv.map(_._1).forall(n => n.startsWith("lang=")), inv)
    assert(inv.map(_._2).sum == 6L, inv)
  }

  test("refusals: transform shapes, double columns, nulls, partition-column ALTER") {
    import spark.implicits._
    // bucket()/days() are SUPPORTED since r14 (their own tests below);
    // the refusals here are the shapes that stay refused
    val (dir2, tbl2) = freshTable()
    val eD = intercept[Exception](spark.sql(
      s"CREATE TABLE $tbl2 (k BIGINT, x DOUBLE) USING `graft-jsondoc` PARTITIONED BY (x)"))
    assert(msgs(eD).exists(_.contains("floating-point")), s"wrong: $eD")
    val (dir3, tbl3) = freshTable()
    seed(tbl3)
    // NULL partition value is refused at write time
    val eN = intercept[Exception](
      Seq((9L, null.asInstanceOf[String], 1L)).toDF("k", "lang", "n")
        .coalesce(1).writeTo(tbl3).append())
    assert(msgs(eN).exists(_.contains("partition column lang")), s"wrong: $eN")
    // ALTER cannot drop or retype the partition column
    val eA = intercept[Exception](spark.sql(s"ALTER TABLE $tbl3 DROP COLUMN lang"))
    assert(msgs(eA).exists(_.contains("partition column")), s"wrong: $eA")
  }

  test("cluster() on a partitioned table range-clusters WITHIN each partition directory") {
    // refused outright in r13; r14 gives partitioned MVs the q188
    // write-set bound: an ordered (partition, k) distribution lands each
    // directory's files as contiguous non-overlapping k ranges
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang)")
    // 300 rows, 3 languages interleaved over the whole key range
    (0L until 300L).map(k => (k, Seq("de", "en", "fr")((k % 3).toInt)))
      .toDF("k", "lang").repartition(6).writeTo(tbl).append()
    GraftCatalog.cluster(spark, tbl, "k", 6, path = s"$dir")
    // per-directory: >= 1 file, and the files' [min,max] k ranges from
    // the stats sidecar are pairwise non-overlapping (range clustering)
    val stats = JsonDocStats.load(dir)
    val live = JsonDocVersions.latest(dir).get._2
    val byDir = live.groupBy(n => n.substring(0, n.lastIndexOf('/') + 1))
    assert(byDir.keySet.map(_.stripSuffix("/")) === Set("lang=de", "lang=en", "lang=fr"))
    byDir.foreach { case (d, files) =>
      val ranges = files.toSeq.flatMap(n => stats.get(n).flatMap(_.cols.get("k")))
        .map(r => (r.min.asInstanceOf[Long], r.max.asInstanceOf[Long])).sorted
      assert(ranges.nonEmpty, s"$d has no stats")
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) =>
          assert(hi < lo, s"$d files overlap on k: $ranges")
        case _ => ()
      }
    }
    // the answer is unchanged and a (partition, range) filter prunes to
    // few files through the existing stats machinery
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) === 300L)
    val planned = plannedFiles(s"SELECT k FROM $tbl WHERE lang = 'en' AND k < 30")
    assert(planned.forall(_.contains("/lang=en/")), planned)
    assert(planned.size < byDir("lang=en/").size || byDir("lang=en/").size == 1,
      s"range filter should prune within the clustered directory: $planned")
    assert(spark.sql(s"SELECT k FROM $tbl WHERE lang = 'en' AND k < 30 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === (0L until 30L).filter(_ % 3 == 1))
  }

  test("write.distribution=none (fanout) keeps a hot partition's upstream parallelism") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang) " +
      "TBLPROPERTIES ('write.distribution' = 'none')")
    // 90%-one-value skew across 4 input tasks: the default clustered
    // distribution would serialize lang=en through ONE task (AQE cannot
    // split one partition VALUE); fanout mode writes it from every task
    // that holds its rows — k files in one directory, compacted later
    val rows = (0L until 200L).map(k => (k, if (k % 10 == 0) "de" else "en"))
    rows.toDF("k", "lang").repartition(4).writeTo(tbl).append()
    val hot = new java.io.File(dir, "lang=en")
    val hotFiles = hot.listFiles().count(f => f.isFile && !f.getName.startsWith("."))
    assert(hotFiles > 1,
      s"fanout write must split the hot partition across tasks, got $hotFiles file(s)")
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE lang = 'en'").head().getLong(0) === 180L)
    // and OPTIMIZE compacts the fanout back to one LIVE file per
    // directory (retired originals stay on disk for time travel)
    assert(GraftCatalog.optimize(dir).isDefined)
    val liveHot = JsonDocVersions.latest(dir).get._2.filter(_.startsWith("lang=en/"))
    assert(liveHot.size === 1, s"expected one live compacted file, got $liveHot")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) === 200L)
  }

  test("streaming WRITE into a partitioned table: epoch files route per directory, exactly-once across restart") {
    val (dir, tbl) = freshTable()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING, n BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang)")
    val src = java.nio.file.Files.createTempDirectory("graft_pswrite_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pswrite_ck").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src, "b0.json"),
      """{"k": 1, "lang": "en", "n": 10}
{"k": 2, "lang": "de", "n": 20}""")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    def start() = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", src).load()
      .writeStream.format("graft-jsondoc").option("path", dir)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // epoch files landed inside their partition directories
    val live = JsonDocSource.listDataFiles(dir).map(f => JsonDocSource.relName(dir, f)).toSeq
    assert(live.exists(n => n.startsWith("lang=en/part-e")), live)
    assert(live.exists(n => n.startsWith("lang=de/part-e")), live)
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L))
    // restart with a new input file: no duplicates, new rows route too
    java.nio.file.Files.writeString(java.nio.file.Paths.get(src, "b1.json"),
      """{"k": 3, "lang": "en", "n": 30}""")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L), "restart duplicated or lost a partitioned epoch")
    // partition pruning and the inventory see streaming-written dirs
    assert(spark.sql(s"SELECT k FROM $tbl WHERE lang = 'en' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val inv = spark.sql(s"SELECT partition, n_rows FROM graftcat.`$dir#partitions` ORDER BY partition")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(inv === Seq(("lang=de", 1L), ("lang=en", 2L)), inv)
  }

  test("a partitioned write clusters rows by partition value (one file per value, not per task)") {
    // the Write declares RequiresDistributionAndOrdering clustered on
    // the partition columns, so rows of one value co-locate in one task:
    // an input spread over 4 partitions still lands ONE file per lang —
    // without the requested shuffle it would be up to 4 per lang (the
    // open-file/small-file fan-out that kills partitioned writes at
    // scale)
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang)")
    (1L to 40L).map(k => (k, if (k % 2 == 0) "en" else "de")).toDF("k", "lang")
      .repartition(4) // both langs present in every input partition
      .writeTo(tbl).append()
    val live = JsonDocSource.listDataFiles(dir).map(f => JsonDocSource.relName(dir, f))
    assert(live.count(_.startsWith("lang=en/")) == 1, live.toSeq)
    assert(live.count(_.startsWith("lang=de/")) == 1, live.toSeq)
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 40L)
  }

  test("aggregate-pushdown and micro-batch scans partition-prune by directory name too") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    // delete the stats sidecar: stats-based skipping is now impossible,
    // so any file skipped below is skipped by the DIRECTORY NAME alone —
    // isolating the shared partition pruner on the two non-row-scan paths
    assert(new java.io.File(dir, "_stats.json").delete())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    // aggregate pushdown: COUNT(*) WHERE lang='en' plans only lang=en files
    val b = new JsonDocScanBuilder(schema, dir)
    assert(b.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("lang", "en"))).isEmpty)
    assert(b.pushAggregation(new org.apache.spark.sql.connector.expressions.aggregate.Aggregation(
      Array(new org.apache.spark.sql.connector.expressions.aggregate.CountStar), Array.empty)))
    val aggParts = b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[JsonDocPartition].rel)
    assert(aggParts.nonEmpty && aggParts.forall(_.startsWith("lang=en/")), aggParts.toSeq)
    // micro-batch: the same static filter prunes per batch
    val stream = new JsonDocMicroBatchStream(schema, dir,
      Array(org.apache.spark.sql.sources.EqualTo("lang", "en")))
    val end = stream.latestOffset()
    val mbParts = stream.planInputPartitions(stream.initialOffset(), end)
      .map(_.asInstanceOf[JsonDocPartition].rel)
    assert(mbParts.nonEmpty && mbParts.forall(_.startsWith("lang=en/")), mbParts.toSeq)
  }

  test("partition values with special characters round-trip via URL encoding") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (tag)")
    Seq((1L, "a/b=c d"), (2L, "plain")).toDF("k", "tag")
      .coalesce(1).writeTo(tbl).append()
    // the layout never leaks a raw '/' or '=' from the value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(d => d.count(_ == '=') == 1 && !d.contains('/')), dirs.toSeq)
    assert(spark.sql(s"SELECT k FROM $tbl WHERE tag = 'a/b=c d'")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(spark.sql(s"SELECT k, tag FROM $tbl ORDER BY k").collect().map(_.toSeq).toSeq
      === Seq(Seq(1L, "a/b=c d"), Seq(2L, "plain")))
  }

  test("#partitions inventories live directories; unpartitioned tables degenerate to one root row") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    val inv = spark.sql(s"SELECT partition, n_files, n_rows FROM graftcat.`$dir#partitions` " +
      "ORDER BY partition").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inv === Seq(("lang=de", 1L, 1L), ("lang=en", 1L, 2L), ("lang=fr", 1L, 1L)), inv)
    // a DELETE shrinks only its partition's count
    spark.sql(s"DELETE FROM $tbl WHERE lang = 'en' AND k = 1")
    val inv2 = spark.sql(s"SELECT partition, n_rows FROM graftcat.`$dir#partitions` " +
      "ORDER BY partition").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(inv2 === Seq(("lang=de", 1L), ("lang=en", 1L), ("lang=fr", 1L)), inv2)
    // unpartitioned: one "" row covering the whole table
    val root2 = java.nio.file.Files.createTempDirectory("graft_part_flat").toString
    val tbl2 = s"graftcat.`$root2/t`"
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl2 (k BIGINT) USING `graft-jsondoc`")
    Seq(1L, 2L, 3L).toDF("k").coalesce(1).writeTo(tbl2).append()
    val flat = spark.sql(s"SELECT partition, n_rows FROM graftcat.`$root2/t#partitions`")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(flat === Seq(("", 3L)), flat)
  }

  test("streaming READ from a partitioned table: appends arrive incrementally, partition filters prune per batch") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING, n BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (lang)")
    Seq((1L, "en", 10L), (2L, "de", 20L)).toDF("k", "lang", "n")
      .coalesce(1).writeTo(tbl).append()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_part_sread").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", s"$dir").load()
      .filter(org.apache.spark.sql.functions.col("lang") === "en") // pushed per micro-batch
      .writeStream.format("memory").queryName("part_stream_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("part_stream_sink").collect().map(_.getLong(0)).toSeq === Seq(1L))
      // a second partitioned APPEND is new input; only the en rows pass
      Seq((3L, "en", 30L), (4L, "fr", 40L)).toDF("k", "lang", "n")
        .coalesce(1).writeTo(tbl).append()
      q.processAllAvailable()
      assert(spark.table("part_stream_sink").collect().map(_.getLong(0)).sorted.toSeq
        === Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming a batch-appended catalog table delivers every append (version offsets beat name order)") {
    // batch appends embed a random queryId UUID in the file name, so a
    // second append can sort BELOW the name watermark — under pre-r13
    // name offsets those rows were silently never delivered. Manifest
    // tables now stream by live-set diff between snapshot versions, so
    // delivery follows commit order regardless of name order. Loop a few
    // appends to make a below-watermark UUID draw overwhelmingly likely.
    val root = java.nio.file.Files.createTempDirectory("graft_vstream").toString
    val tbl = s"graftcat.`$root/t`"
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    Seq(0L).toDF("k").coalesce(1).writeTo(tbl).append()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vstream_ck").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", s"$root/t").load()
      .writeStream.format("memory").queryName("vmode_sink")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      (1L to 6L).foreach { i =>
        Seq(i).toDF("k").coalesce(1).writeTo(tbl).append()
        q.processAllAvailable()
      }
      assert(spark.table("vmode_sink").collect().map(_.getLong(0)).sorted.toSeq
        === (0L to 6L), "every append must arrive exactly once, whatever its name sorts as")
    } finally q.stop()
  }

  test("partition-value encoding round-trips any string, and directory names stay layout-safe") {
    // generated strings (unicode, separators, dots, empties are refused
    // upstream — non-null contract) must survive encode -> decode
    // exactly, and the encoded form must never contain the characters
    // that would corrupt a col=value path component
    val gen = org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.asciiPrintableStr,
      org.scalacheck.Gen.listOfN(8, org.scalacheck.Gen.oneOf(Seq(
        "/", "=", "%", ".", " ", "\t", "a", "ß", "中", "\ud83d\ude42"))).map(_.mkString),
      org.scalacheck.Gen.alphaNumStr)
    val samples = org.scalacheck.Gen.listOfN(500, gen)
      .apply(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(1337L)).get
    // the leading-dot case the property caught for real: a ".hidden"
    // value must produce a VISIBLE directory (listings skip dot names)
    (samples.filter(_.nonEmpty) ++ Seq(".hidden", "_meta", "..", "_")).foreach { s =>
      val enc = JsonDocSource.encPartValue(s)
      assert(!enc.contains('/') && !enc.contains('=') && !enc.startsWith(".") &&
        !enc.startsWith("_"), s"unsafe directory component for '$s': '$enc'")
      assert(JsonDocSource.decPartValue(enc,
        org.apache.spark.sql.types.StringType).contains(s),
        s"string round-trip broke for '$s' (enc '$enc')")
    }
    // typed round-trips: long/int/boolean decode back to the typed value
    // the stats pruner compares with (ints widen to Long by design)
    Seq(Long.MinValue, -1L, 0L, 42L, Long.MaxValue).foreach { v =>
      assert(JsonDocSource.decPartValue(JsonDocSource.encPartValue(v),
        org.apache.spark.sql.types.LongType).contains(v))
    }
    Seq(true, false).foreach { v =>
      assert(JsonDocSource.decPartValue(JsonDocSource.encPartValue(v),
        org.apache.spark.sql.types.BooleanType).contains(v))
    }
    // a token that does not parse as the declared type is None — the
    // pruner then keeps the file (conservative), never miscompares
    assert(JsonDocSource.decPartValue("not_a_number",
      org.apache.spark.sql.types.LongType).isEmpty)
  }

  test("expiring a streaming checkpoint's basis snapshot fails the restart loudly") {
    // version-mode offsets carry the snapshot the consumer validated up
    // to; expire_snapshots deleting that manifest makes the downtime
    // window unprovable — the source must refuse, not guess
    val root = java.nio.file.Files.createTempDirectory("graft_vexp").toString
    val tbl = s"graftcat.`$root/t`"
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    Seq(1L).toDF("k").coalesce(1).writeTo(tbl).append() // v1
    val ckpt = java.nio.file.Files.createTempDirectory("graft_vexp_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_vexp_out").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    def start() = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", s"$root/t").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // consumed at basis v1
    // while down: two appends, then expire everything below current
    Seq(2L).toDF("k").coalesce(1).writeTo(tbl).append() // v2
    Seq(3L).toDF("k").coalesce(1).writeTo(tbl).append() // v3
    val now = System.currentTimeMillis()
    Seq(1, 2).foreach(v => assert(new java.io.File(s"$root/t",
      f"_manifest_v$v%06d.json").setLastModified(now - 8L * 24 * 3600 * 1000)))
    GraftCatalog.expireSnapshots(s"$root/t", now - 7L * 24 * 3600 * 1000)
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(msgs(e).exists(m => m.contains("expired/vacuumed")), s"wrong error: $e")
  }

  test("time travel and history work across partitioned commits") {
    val (dir, tbl) = freshTable()
    seed(tbl) // v1
    spark.sql(s"DELETE FROM $tbl WHERE lang = 'de'") // v2
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) == 3L)
    assert(spark.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 1").head().getLong(0) == 4L)
    val hist = spark.sql(s"SELECT version, n_rows FROM graftcat.`$dir#history` ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hist === Seq((1L, 4L), (2L, 3L)), hist)
  }

  // ---- transform partitioning (r14): days() and bucket() ----

  private def plannedFiles(sql: String): Seq[String] =
    spark.sql(sql).queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.map(_.asInstanceOf[JsonDocPartition].file).toSeq

  test("days(string) layout: day directories, equality and range pruning at plan time") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, ts STRING, n BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (days(ts))")
    Seq((1L, "2024-01-15T08:00:00", 10L), (2L, "2024-01-15T23:59:59", 20L),
      (3L, "2024-01-16T00:00:00", 30L), (4L, "2024-02-01T12:00:00", 40L))
      .toDF("k", "ts", "n").coalesce(1).writeTo(tbl).append()
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.toSeq === Seq("ts_day=2024-01-15", "ts_day=2024-01-16", "ts_day=2024-02-01"))
    // equality on the SOURCE column prunes to its day directory
    val eq = plannedFiles(s"SELECT k FROM $tbl WHERE ts = '2024-01-15T08:00:00'")
    assert(eq.nonEmpty && eq.forall(_.contains("/ts_day=2024-01-15/")), eq)
    // a RANGE filter prunes day directories (days is monotone) — the
    // layout identity partitioning cannot express (thousands of distinct
    // timestamps would each be a directory; here they share their day)
    val range = plannedFiles(s"SELECT k FROM $tbl WHERE ts >= '2024-01-16'")
    assert(range.nonEmpty && range.forall(f =>
      f.contains("/ts_day=2024-01-16/") || f.contains("/ts_day=2024-02-01/")), range)
    assert(spark.sql(s"SELECT k FROM $tbl WHERE ts >= '2024-01-16' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(3L, 4L))
    // the boundary day is KEPT for ts < '2024-01-16' (its rows might
    // qualify; the row filter decides) and the later day pruned
    val lt = plannedFiles(s"SELECT k FROM $tbl WHERE ts < '2024-01-16'")
    assert(lt.forall(!_.contains("/ts_day=2024-02-01/")), lt)
    assert(spark.sql(s"SELECT k FROM $tbl WHERE ts < '2024-01-16' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("days(bigint) treats the column as epoch millis (UTC, floorDiv-safe)") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, ms BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (days(ms))")
    val day0 = 1705276800000L // 2024-01-15T00:00:00Z
    Seq((1L, day0 + 3600000L), (2L, day0 + 86400000L + 1L), (3L, -1L))
      .toDF("k", "ms").coalesce(1).writeTo(tbl).append()
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    // -1 ms is 1969-12-31 (floorDiv, not truncation-toward-zero)
    assert(subdirs.toSeq === Seq("ms_day=1969-12-31", "ms_day=2024-01-15", "ms_day=2024-01-16"))
    val planned = plannedFiles(s"SELECT k FROM $tbl WHERE ms > ${day0 + 86400000L}")
    assert(planned.nonEmpty && planned.forall(_.contains("/ms_day=2024-01-16/")), planned)
    assert(spark.sql(s"SELECT k FROM $tbl WHERE ms > ${day0 + 86400000L}")
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("hours/months/years grains: directory naming, monotone range pruning, millis mapping") {
    // hours(string): one directory per UTC hour, range filters prune
    val (dirH, tblH) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tblH (k BIGINT, ts STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (hours(ts))")
    Seq((1L, "2024-01-15T08:10:00"), (2L, "2024-01-15T08:59:59"),
      (3L, "2024-01-15T09:00:00"), (4L, "2024-01-16T00:30:00"))
      .toDF("k", "ts").coalesce(1).writeTo(tblH).append()
    assert(new java.io.File(dirH).listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("ts_hour=2024-01-15T08", "ts_hour=2024-01-15T09", "ts_hour=2024-01-16T00"))
    val hr = plannedFiles(s"SELECT k FROM $tblH WHERE ts >= '2024-01-15T09'")
    assert(hr.nonEmpty && hr.forall(f =>
      f.contains("=2024-01-15T09/") || f.contains("=2024-01-16T00/")), hr)
    assert(spark.sql(s"SELECT k FROM $tblH WHERE ts >= '2024-01-15T09' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(3L, 4L))

    // months(bigint): epoch millis map to their UTC month; equality prunes
    val (dirM, tblM) = freshTable()
    spark.sql(s"CREATE TABLE $tblM (k BIGINT, ms BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (months(ms))")
    val jan15 = 1705276800000L // 2024-01-15T00:00:00Z
    Seq((1L, jan15), (2L, jan15 + 31L * 86400000L), (3L, -1L))
      .toDF("k", "ms").coalesce(1).writeTo(tblM).append()
    assert(new java.io.File(dirM).listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("ms_month=1969-12", "ms_month=2024-01", "ms_month=2024-02"))
    val meq = plannedFiles(s"SELECT k FROM $tblM WHERE ms = $jan15")
    assert(meq.nonEmpty && meq.forall(_.contains("/ms_month=2024-01/")), meq)

    // years(string): coarse grain, range keeps the boundary year only
    val (dirY, tblY) = freshTable()
    spark.sql(s"CREATE TABLE $tblY (k BIGINT, d STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (years(d))")
    Seq((1L, "2023-06-01"), (2L, "2024-01-01"), (3L, "2025-12-31"))
      .toDF("k", "d").coalesce(1).writeTo(tblY).append()
    assert(new java.io.File(dirY).listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("d_year=2023", "d_year=2024", "d_year=2025"))
    val yr = plannedFiles(s"SELECT k FROM $tblY WHERE d < '2024-06'")
    assert(yr.nonEmpty && yr.forall(!_.contains("/d_year=2025/")), yr)
    assert(spark.sql(s"SELECT k FROM $tblY WHERE d < '2024-06' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("truncate(w) layout: string prefixes and integral floors, ranges prune in the source domain") {
    // truncate(3, string): prefix directories; equality and range prune
    val (dirS, tblS) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tblS (k BIGINT, code STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (truncate(3, code))")
    Seq((1L, "AAA-17"), (2L, "AAB-02"), (3L, "ZK"), (4L, "AAA-99"))
      .toDF("k", "code").coalesce(1).writeTo(tblS).append()
    assert(new java.io.File(dirS).listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("code_trunc=AAA", "code_trunc=AAB", "code_trunc=ZK"))
    val eq = plannedFiles(s"SELECT k FROM $tblS WHERE code = 'AAA-99'")
    assert(eq.nonEmpty && eq.forall(_.contains("/code_trunc=AAA/")), eq)
    val ge = plannedFiles(s"SELECT k FROM $tblS WHERE code >= 'AAB'")
    assert(ge.nonEmpty && ge.forall(!_.contains("/code_trunc=AAA/")), ge)
    assert(spark.sql(s"SELECT k FROM $tblS WHERE code >= 'AAB' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))

    // truncate(100, bigint): floor-to-multiple directories; NUMERIC
    // range pruning (lexicographic would order 900 after 1000)
    val (dirL, tblL) = freshTable()
    spark.sql(s"CREATE TABLE $tblL (k BIGINT, v BIGINT) " +
      "USING `graft-jsondoc` PARTITIONED BY (truncate(100, v))")
    Seq((1L, 17L), (2L, 950L), (3L, 1049L), (4L, -1L))
      .toDF("k", "v").coalesce(1).writeTo(tblL).append()
    assert(new java.io.File(dirL).listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      === Seq("v_trunc=-100", "v_trunc=0", "v_trunc=1000", "v_trunc=900"))
    // v >= 900 must keep 900 and 1000 — and prune 0 even though "0" > ""
    // and "1000" < "900" lexicographically
    val nr = plannedFiles(s"SELECT k FROM $tblL WHERE v >= 900")
    assert(nr.nonEmpty && nr.forall(f =>
      f.contains("/v_trunc=900/") || f.contains("/v_trunc=1000/")), nr)
    assert(spark.sql(s"SELECT k FROM $tblL WHERE v >= 900 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
    // floorMod keeps negatives in their floor directory, readable back
    assert(spark.sql(s"SELECT k FROM $tblL WHERE v < 0").collect()
      .map(_.getLong(0)).toSeq === Seq(4L))
  }

  test("bucket(n) layout: stable hash routing, point and In pruning") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (bucket(4, k))")
    (1L to 8L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.forall(_.startsWith("k_bucket=")), subdirs)
    // a point filter prunes to exactly ONE bucket directory — the
    // pruner's hash is the writer's hash by construction
    val b5 = GraftTransforms.bucketOf(5L, 4)
    val planned = plannedFiles(s"SELECT v FROM $tbl WHERE k = 5")
    assert(planned.nonEmpty && planned.forall(_.contains(s"/k_bucket=$b5/")), planned)
    assert(spark.sql(s"SELECT v FROM $tbl WHERE k = 5").collect().map(_.getString(0)).toSeq
      === Seq("v5"))
    // In prunes to the union of its keys' buckets
    val inBuckets = Set(2L, 3L).map(GraftTransforms.bucketOf(_, 4))
    val plannedIn = plannedFiles(s"SELECT v FROM $tbl WHERE k IN (2, 3)")
    assert(plannedIn.forall(f => inBuckets.exists(b => f.contains(s"/k_bucket=$b/"))), plannedIn)
    assert(spark.sql(s"SELECT v FROM $tbl WHERE k IN (2, 3) ORDER BY k")
      .collect().map(_.getString(0)).toSeq === Seq("v2", "v3"))
    // a range filter cannot prune a hash layout — but answers correctly
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE k >= 7").head().getLong(0) === 2L)
  }

  test("clustered write distribution resolves the transforms: one file per day directory") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, ts STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (days(ts))")
    // 40 rows over 4 days, deliberately scattered across 8 input tasks:
    // the required clustered distribution (days(ts), resolved through
    // the catalog's FunctionCatalog to the writer's own day function)
    // must co-locate each day into one task → exactly one data file per
    // day directory, the open-file bound the distribution exists for
    val rows = (0 until 40).map(i => (i.toLong, f"2024-03-${(i % 4) + 1}%02dT12:00:$i%02d"))
    rows.toDF("k", "ts").repartition(8).writeTo(tbl).append()
    val perDir = new java.io.File(dir).listFiles().filter(_.isDirectory).map { d =>
      d.getName -> d.listFiles().count(f => f.isFile && !f.getName.startsWith("."))
    }.toMap
    assert(perDir.keySet === Set("ts_day=2024-03-01", "ts_day=2024-03-02",
      "ts_day=2024-03-03", "ts_day=2024-03-04"))
    assert(perDir.values.forall(_ == 1),
      s"clustered-by-transform write must land one file per day dir, got $perDir")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) === 40L)
  }

  test("OPTIMIZE between runs: a restarted checkpointed stream rebases across the compaction (zero dup, zero loss)") {
    val root = java.nio.file.Files.createTempDirectory("graft_rebase").toString
    val tbl = s"graftcat.`$root/t`"
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    (0L to 2L).foreach(i => Seq(i).toDF("k").coalesce(1).writeTo(tbl).append())
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rebase_ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft_rebase_out").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))
    // parquet file sink: exactly-once across restarts via its metadata
    // log (a memory sink resets on restart and would hide duplicates)
    def start() = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", s"$root/t").load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def sunk(): Seq[Long] =
      spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(sunk() === (0L to 2L))
    // while the stream is DOWN: compact the three fully-consumed files,
    // then append a fourth — pre-r14 the restart aborted ("re-ingest
    // from a fresh checkpoint"); with rewrite records it RESUMES: the
    // compacted output is provably fully-consumed and skipped, the new
    // append delivers
    assert(GraftCatalog.optimize(s"$root/t").isDefined, "three small files must compact")
    Seq(3L).toDF("k").coalesce(1).writeTo(tbl).append()
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    assert(sunk() === (0L to 3L),
      "restart must deliver exactly the new append — no duplicates from the compacted output, no loss")
  }

  test("rebase refusals: mixed consumed/unconsumed inputs, and purged (DV-applied) consumed inputs") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    import spark.implicits._
    // MIXED: consume 2 of 3 files, compact all 3 -> the output straddles
    // the consumption boundary; the batch planner must abort loudly
    val root1 = java.nio.file.Files.createTempDirectory("graft_rebase_mix").toString
    val tbl1 = s"graftcat.`$root1/t`"
    spark.sql(s"CREATE TABLE $tbl1 (k BIGINT) USING `graft-jsondoc`")
    (0L to 2L).foreach(i => Seq(i).toDF("k").coalesce(1).writeTo(tbl1).append())
    val stream1 = new JsonDocMicroBatchStream(schema, s"$root1/t", Array.empty)
    // consumed basis: version 2 (the first two appends)
    val startOff = FileNameOffset("", Some(2))
    assert(GraftCatalog.optimize(s"$root1/t").isDefined)
    val end1 = stream1.latestOffset().asInstanceOf[FileNameOffset]
    val e1 = intercept[IllegalStateException] {
      stream1.planInputPartitions(startOff, end1)
    }
    assert(e1.getMessage.contains("consumed and unconsumed"), e1.getMessage)

    // PURGED: delete rows (MOR) from fully-consumed files, compact (DVs
    // applied) -> consumed rows are now dead; the rebase must refuse
    val root2 = java.nio.file.Files.createTempDirectory("graft_rebase_purge").toString
    val tbl2 = s"graftcat.`$root2/t`"
    spark.sql(s"CREATE TABLE $tbl2 (k BIGINT) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    (0L to 2L).foreach(i => Seq(i).toDF("k").coalesce(1).writeTo(tbl2).append())
    val consumedV = JsonDocVersions.manifests(s"$root2/t").last
    spark.sql(s"DELETE FROM $tbl2 WHERE k = 1") // MOR: a DV, no rewrite
    assert(GraftCatalog.optimize(s"$root2/t").isDefined)
    val stream2 = new JsonDocMicroBatchStream(schema, s"$root2/t", Array.empty)
    val end2 = stream2.latestOffset().asInstanceOf[FileNameOffset]
    val e2 = intercept[IllegalStateException] {
      stream2.planInputPartitions(FileNameOffset("", Some(consumedV)), end2)
    }
    assert(e2.getMessage.contains("delete vectors") ||
      e2.getMessage.contains("merge-on-read"), e2.getMessage)
  }

  test("partition-scoped OPTIMIZE compacts only its subtree; other directories stay untouched") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, c STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (c)")
    // 3 small files per partition value (separate appends)
    (1 to 3).foreach { i =>
      Seq((i.toLong, "x"), (i + 10L, "y")).toDF("k", "c")
        .coalesce(1).writeTo(tbl).append()
    }
    def filesIn(sub: String): Set[String] =
      Option(new java.io.File(dir, sub).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .map(_.getName).toSet
    def liveIn(sub: String): Set[String] =
      JsonDocVersions.latest(dir).get._2.filter(_.startsWith(sub + "/"))
    val yBefore = filesIn("c=y")
    assert(liveIn("c=x").size === 3 && yBefore.size === 3)
    val v = spark.sql(
      s"CALL graftcat.optimize('$dir', ${8L * 1024 * 1024}, 'c=x')")
      .collect()(0).getLong(0)
    assert(v > 0, "the scoped subtree has 3 small files to compact")
    assert(liveIn("c=x").size === 1, "the scoped subtree must compact to one live file")
    assert(liveIn("c=y").size === 3 && filesIn("c=y") === yBefore,
      "out-of-scope directories must be untouched, live and physical")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L, 11L, 12L, 13L))
    // a scope matching nothing is a no-op, not an error
    assert(GraftCatalog.optimize(dir, scope = "c=zzz").isEmpty)
  }

  test("a pruned scan never LISTS an excluded partition directory (walk-time pruning)") {
    val (dir, tbl) = freshTable()
    seed(tbl)
    ListingProbe.reset()
    ListingProbe.enabled = true
    try {
      // equality prune: the walk must descend into lang=en only — at
      // 10^5 partition directories the listing itself is the planning
      // cost, so excluded subtrees are skipped BEFORE their files exist
      // to be filtered (r14, r13 verdict item 3)
      val planned = plannedFiles(s"SELECT k FROM $tbl WHERE lang = 'en'")
      assert(planned.nonEmpty && planned.forall(_.contains("/lang=en/")))
      val listedDirs = ListingProbe.listed.toArray(Array.empty[String]).toSet
      assert(listedDirs.contains("lang=en"), listedDirs)
      assert(!listedDirs.contains("lang=de") && !listedDirs.contains("lang=fr"),
        s"excluded directories were listed: $listedDirs")
      // an unfiltered scan still walks everything
      ListingProbe.reset()
      assert(spark.sql(s"SELECT count(*) FROM $tbl").head().getLong(0) === 4L)
      val all = ListingProbe.listed.toArray(Array.empty[String]).toSet
      assert(Set("lang=de", "lang=en", "lang=fr").subsetOf(all), all)
    } finally {
      ListingProbe.enabled = false
      ListingProbe.reset()
    }
  }

  test("CALL set_partition_spec evolves future writes; mixed layouts read and prune correctly") {
    val (dir, tbl) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, lang STRING) USING `graft-jsondoc`")
    Seq((1L, "en"), (2L, "de")).toDF("k", "lang").coalesce(1).writeTo(tbl).append() // flat
    val spec = spark.sql(s"CALL graftcat.set_partition_spec('$dir', 'lang')")
      .collect().map(_.getString(0)).toSeq
    assert(spec === Seq("lang"))
    Seq((3L, "en"), (4L, "fr")).toDF("k", "lang").coalesce(1).writeTo(tbl).append() // lang=...
    // both generations read through one schema
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L, 4L))
    // pruning: the new layout's non-matching dirs drop; the old flat
    // file has no components and is conservatively kept (Iceberg's
    // evolution semantics at file grain)
    val planned = plannedFiles(s"SELECT k FROM $tbl WHERE lang = 'en'")
    assert(planned.exists(_.contains("/lang=en/")) && !planned.exists(_.contains("/lang=fr/")),
      planned)
    assert(spark.sql(s"SELECT k FROM $tbl WHERE lang = 'en' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // evolve AGAIN — to days() on a fresh column? not in schema: refused
    val eBad = intercept[Exception](
      spark.sql(s"CALL graftcat.set_partition_spec('$dir', 'days(nope)')"))
    assert(msgs(eBad).exists(_.contains("not in the schema")), eBad.getMessage)
    // ... and to EMPTY (unpartition future writes)
    spark.sql(s"CALL graftcat.set_partition_spec('$dir', '')")
    Seq((5L, "en")).toDF("k", "lang").coalesce(1).writeTo(tbl).append() // flat again
    assert(spark.sql(s"SELECT count(*) FROM $tbl WHERE lang = 'en'").head().getLong(0) === 3L)
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect().map(_.getLong(0)).toSeq
      === (1L to 5L))
  }

  test("transform tables refuse unsupported shapes loudly") {
    val (_, tbl) = freshTable()
    // days over a double — not a time type this source can day-map
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE $tbl (k BIGINT, x DOUBLE) USING `graft-jsondoc` PARTITIONED BY (days(x))"))
    assert(msgs(e1).exists(_.contains("days()")), e1.getMessage)
    // an unknown transform family (the full Iceberg set is implemented
    // as of r14, so the refused example is a made-up name)
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $tbl (k BIGINT, ts STRING) USING `graft-jsondoc` PARTITIONED BY (foo(ts))"))
    assert(msgs(e2).exists(m => m.contains("unsupported partition transform") ||
      m.contains("foo")), e2.getMessage)
    // a days() write with a non-ISO value fails loudly, not into garbage dirs
    val (_, tbl3) = freshTable()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $tbl3 (k BIGINT, ts STRING) " +
      "USING `graft-jsondoc` PARTITIONED BY (days(ts))")
    val e3 = intercept[Exception](
      Seq((1L, "junk")).toDF("k", "ts").writeTo(tbl3).append())
    assert(msgs(e3).exists(_.contains("ISO-8601")), e3.getMessage)
  }
}
