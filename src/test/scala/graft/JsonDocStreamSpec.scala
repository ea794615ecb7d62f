package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The custom source's MicroBatchStream: new response files become the
  * next micro-batch; pushed filters apply inside every micro-batch. */
class JsonDocStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeFile(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  test("streaming read: appended files arrive as incremental micro-batches") {
    val dir = Files.createTempDirectory("graft_stream_src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toFile.getAbsolutePath
    writeFile(dir, "b0.json", Seq(
      """{"doc_id": 1, "lang": "en", "n_chars": 100}""",
      """{"doc_id": 2, "lang": "de", "n_chars": 50}"""))

    val stream = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", dir).load()
      .filter(col("n_chars") >= 100) // pushed into each micro-batch's scan

    val q = stream.writeStream.format("memory")
      .queryName("jsondoc_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("jsondoc_sink").collect()
      assert(after1.map(_.getLong(0)).toSet == Set(1L))

      writeFile(dir, "b1.json", Seq(
        """{"doc_id": 3, "lang": "en", "n_chars": 400}""",
        """{"doc_id": 4, "lang": "fr", "n_chars": 10}"""))
      q.processAllAvailable()
      val after2 = spark.table("jsondoc_sink").collect()
      // doc 4 filtered at the source; docs 1 and 3 pass, no re-reads of b0
      assert(after2.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    } finally q.stop()
  }

  test("deleting an already-consumed file does not shift later batches (name-watermark offsets)") {
    val dir = Files.createTempDirectory("graft_stream_del").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_stream_del_ckpt").toFile.getAbsolutePath
    writeFile(dir, "b0.json", Seq("""{"doc_id": 1, "lang": "en", "n_chars": 100}"""))

    val stream = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", dir).load()

    val q = stream.writeStream.format("memory")
      .queryName("jsondoc_del_sink")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("jsondoc_del_sink").collect().map(_.getLong(0)).toSet == Set(1L))

      // a count-based offset (committed = 1 file) would now replay from
      // position 1 of the shifted listing: b1 would be silently skipped
      Files.delete(Paths.get(dir, "b0.json"))
      writeFile(dir, "b1.json", Seq("""{"doc_id": 2, "lang": "de", "n_chars": 200}"""))
      writeFile(dir, "b2.json", Seq("""{"doc_id": 3, "lang": "fr", "n_chars": 300}"""))
      q.processAllAvailable()
      // exactly the new files — nothing skipped, nothing replayed
      assert(spark.table("jsondoc_del_sink").collect().map(_.getLong(0)).sorted.toSeq
        == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("restart from checkpoint resumes at the committed name watermark") {
    val dir = Files.createTempDirectory("graft_stream_rs").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_stream_rs_ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("graft_stream_rs_out").toFile.getAbsolutePath
    writeFile(dir, "b0.json", Seq("""{"doc_id": 1, "lang": "en", "n_chars": 100}"""))

    // file sink: the one that actually supports checkpoint recovery
    def start() = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", dir).load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()

    // while the stream is DOWN: consumed file deleted, two files appear
    Files.delete(Paths.get(dir, "b0.json"))
    writeFile(dir, "b1.json", Seq("""{"doc_id": 2, "lang": "de", "n_chars": 200}"""))
    writeFile(dir, "b2.json", Seq("""{"doc_id": 3, "lang": "fr", "n_chars": 300}"""))

    // a fresh MicroBatchStream instance recovers the watermark purely
    // from the checkpointed offset NAME: doc 1 is not replayed (its file
    // is gone — a positional offset would also mis-skip b1), docs 2-3
    // arrive exactly once
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 3L))
  }

  test("streaming WRITE: epoch files through the V2 sink, exactly-once across restart") {
    // the full custom-table loop: graft-jsondoc SOURCE -> graft-jsondoc
    // SINK. Each micro-batch commits as per-epoch final files via the
    // task-temp/driver-rename protocol; a checkpointed restart must add
    // only the NEW micro-batch (epoch+partition in the final name is the
    // idempotency key).
    val dir = Files.createTempDirectory("graft_swrite_src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_swrite_ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("graft_swrite_out").toFile.getAbsolutePath
    writeFile(dir, "b0.json", Seq(
      """{"doc_id": 1, "lang": "en", "n_chars": 100}""",
      """{"doc_id": 2, "lang": "de", "n_chars": 50}"""))

    def start() = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", dir).load()
      .writeStream.format("graft-jsondoc")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      q1.processAllAvailable()
      writeFile(dir, "b1.json", Seq(
        """{"doc_id": 3, "lang": "fr", "n_chars": 300}"""))
      q1.processAllAvailable()
    } finally q1.stop()

    val visible = new java.io.File(out).listFiles().filter(_.isFile)
    assert(visible.forall(f => !f.getName.startsWith(".")), "temps leaked past commit")
    // two micro-batches -> (at least) two distinct epoch prefixes
    assert(visible.map(_.getName.split("-p").head).distinct.length >= 2, visible.map(_.getName).toSeq)

    def readBack = spark.read.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema).option("path", out).load()
    assert(readBack.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))

    // restart from the same checkpoint with a new input file: docs 1-3
    // must NOT duplicate. (The restart carries the SAME queryId — Spark
    // hands the checkpoint-resident id, not the per-run runId, to the
    // write builder — which is also what lets the sink's _sink_query
    // marker admit restarts while refusing a second query.)
    writeFile(dir, "b2.json", Seq(
      """{"doc_id": 4, "lang": "en", "n_chars": 400}"""))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 4L),
      "restart duplicated or lost committed epochs")

    // every epoch's commit must KEEP the earlier epochs' stats entries
    // (the sidecar-merge regression dropped all but the first on any
    // multi-entry merge): all three #history versions exactly counted
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val hist = spark.sql(
      s"SELECT version, n_rows FROM graftcat.`$out#history` ORDER BY version")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSeq
    assert(hist.map(_._2) === Seq(Some(2L), Some(3L), Some(4L)),
      s"streaming epochs must stay exactly counted, got $hist")
  }

  test("a SECOND streaming query into the same sink directory is refused loudly") {
    // final names are keyed (epoch, partition) so a restarted query
    // replaces its own replayed epochs — which means a DIFFERENT query
    // (fresh checkpoint, epochs restarting at 0) would silently
    // overwrite the first run's committed files. The _sink_query marker
    // makes that a loud refusal instead of silent data replacement.
    val dir = Files.createTempDirectory("graft_swrite2_src").toFile.getAbsolutePath
    val out = Files.createTempDirectory("graft_swrite2_out").toFile.getAbsolutePath
    writeFile(dir, "b0.json", Seq("""{"doc_id": 1, "lang": "en", "n_chars": 100}"""))

    def start(ckpt: String) = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", dir).load()
      .writeStream.format("graft-jsondoc")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val ckpt1 = Files.createTempDirectory("graft_swrite2_ck1").toFile.getAbsolutePath
    val q1 = start(ckpt1)
    try q1.processAllAvailable() finally q1.stop()
    val committed = new java.io.File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.length()).toMap
    assert(committed.nonEmpty)

    // same data, FRESH checkpoint: its epoch 0 collides with q1's
    val ckpt2 = Files.createTempDirectory("graft_swrite2_ck2").toFile.getAbsolutePath
    val q2 = start(ckpt2)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable() // throws: the query died on the refused commit
    }
    q2.stop()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("one streaming query per directory")),
      s"wrong error: $e")
    // the first run's committed files are physically untouched
    val after = new java.io.File(out).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(f => f.getName -> f.length()).toMap
    assert(after === committed, "second query must not touch committed files")
  }

  test("OPTIMIZE under a checkpointed streaming source fails loudly, not silently") {
    // a compacted file merges rows from names on both sides of the
    // consumer's watermark — delivering it duplicates, skipping it
    // loses. The source must refuse to continue.
    val root = Files.createTempDirectory("graft_sopt").toFile.getAbsolutePath
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, lang STRING, n_chars BIGINT) " +
      "USING `graft-jsondoc`")
    import spark.implicits._
    Seq((1L, "en", 100L)).toDF("doc_id", "lang", "n_chars")
      .coalesce(1).writeTo(tbl).append()

    val ckpt = Files.createTempDirectory("graft_sopt_ckpt").toFile.getAbsolutePath
    val out = Files.createTempDirectory("graft_sopt_out").toFile.getAbsolutePath
    def start() = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", s"$root/t").load()
      .writeStream.format("parquet") // checkpoint-recoverable sink
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).count() == 1L)

    // while the consumer is down: append + OPTIMIZE (merges consumed and
    // unconsumed names into one compact file)
    Seq((2L, "de", 200L)).toDF("doc_id", "lang", "n_chars")
      .coalesce(1).writeTo(tbl).append()
    graft.sources.GraftCatalog.optimize(s"$root/t", targetBytes = 1L << 20)

    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable() // throws: the source refused the rewritten window
    }
    q2.stop()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // r14: the rewrite record explains the removal, so the refusal is
    // now the PLANNER's sharper diagnosis — this compaction merged a
    // consumed file with an unconsumed one, the unsplittable shape
    // (fully-consumed compactions rebase and RESUME instead, pinned in
    // PartitionedTableSpec)
    assert(msgs(e).exists(_.contains("consumed and unconsumed")),
      s"wrong error: $e")

    // a stream STARTED FRESH on an already-compacted directory is fine:
    // nothing is consumed yet, so compact files are ordinary input
    val ckptFresh = Files.createTempDirectory("graft_sopt_ckptf").toFile.getAbsolutePath
    val q3 = spark.readStream.format("graft-jsondoc")
      .schema(sources.SourceQueries.docSchema)
      .option("path", s"$root/t").load()
      .writeStream.format("memory")
      .queryName("jsondoc_opt_fresh")
      .option("checkpointLocation", ckptFresh)
      .start()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.table("jsondoc_opt_fresh").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
  }
}
