package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp
import graft.streaming.{Ev, QuotaDoc, QuotaOut, Streaming}

/** MemoryStream-driven tests of the streaming operators plus a
  * batch/stream parity check over the events table (the DuckDB oracle
  * can't run a stream, so parity-vs-batch is the correctness argument;
  * the batch side is itself oracle-checked via q22).
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L * 10 + min * 60_000L)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("rate streaming source drives a graft transform (§2B scans row)") {
    // the literal `rate` format: generated (timestamp, value) rows mapped
    // into the event shape and run through the same windowed aggregate
    // the file/memory sources use — completing the §2B source-scan row
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").option("numPartitions", "2").load()
    val evs = rate.select(
      col("timestamp").as("ts"),
      concat(lit("t"), pmod(col("value"), lit(3))).as("event_type"),
      col("value").cast("double").as("value"))
    val q = Streaming.hourlyStats(evs).writeStream.format("memory")
      .queryName("ratehourly").outputMode(OutputMode.Complete).start()
    try {
      // rate is unbounded — poll until the first aggregate lands
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        q.awaitTermination(250)
        n = spark.table("ratehourly").count()
      }
      assert(n > 0, "rate source produced no aggregated rows within 30s")
      val r = spark.table("ratehourly").orderBy("hour_start", "event_type").head()
      assert(r.getAs[String]("event_type").startsWith("t"))
      assert(r.getAs[Long]("n") > 0)
    } finally q.stop()
  }

  test("tumbling window + watermark (hourlyStats)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "view", ts(5), 1.0), Ev(2, 1, "view", ts(20), 2.0),
      Ev(3, 2, "click", ts(70), 5.0))
    runToMemory(Streaming.hourlyStats(mem.toDF()), "hourly", OutputMode.Complete)
    val rows = spark.table("hourly").orderBy("hour_start", "event_type").collect()
    assert(rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"))).toSeq ===
      Seq(("view", 2L), ("click", 1L)))
  }

  test("session windows close at the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // user 1: events at 0,10 (one session), then 60 (new session)
    mem.addData(Ev(1, 1, "a", ts(0), 1.0), Ev(2, 1, "a", ts(10), 1.0), Ev(3, 1, "a", ts(60), 1.0))
    // advance watermark far enough to close everything
    mem.addData(Ev(99, 9, "a", ts(600), 0.0))
    runToMemory(Streaming.sessionStats(mem.toDF()), "sessions")
    val rows = spark.table("sessions").filter(col("user_id") === 1)
      .orderBy("session_start").collect()
    assert(rows.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L))
  }

  test("dropDuplicatesWithinWatermark removes in-watermark dup ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(Ev(1, 1, "a", ts(0), 1.0), Ev(1, 1, "a", ts(1), 1.0), Ev(2, 1, "a", ts(2), 1.0))
    runToMemory(Streaming.dedupedWithinWatermark(mem.toDF()), "dedup")
    assert(spark.table("dedup").select("event_id").distinct().count() === 2)
    assert(spark.table("dedup").count() === 2)
  }

  test("streaming content-fingerprint dedup matches batch q29 over the appended corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // an appending document corpus: micro-batch 2 re-delivers batch 1's
    // first document with different punctuation/case (same canonical
    // fingerprint) — the stream must pass only the first arrival, and a
    // batch q29-style dedup over the ACCUMULATED corpus must agree.
    // Duplicates are only placed across batches: within a batch,
    // dropDuplicates keeps an arbitrary partition's row, across batches
    // the state store makes first-batch-wins deterministic.
    val mem = MemoryStream[(Long, String, Timestamp)]
    val b1 = Seq(
      (1L, "The quick brown fox", ts(0)),
      (2L, "an entirely different document", ts(1)))
    val b2 = Seq(
      (3L, "the QUICK... brown,, fox!!", ts(2)), // canonical dup of doc 1
      (4L, "fresh content arrives later", ts(3)))
    mem.addData(b1)
    val docs = mem.toDF().toDF("doc_id", "text", "ingest_ts")
    val q = Streaming.dedupedDocsByFingerprint(docs).writeStream
      .format("memory").queryName("fpdedup").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("fpdedup").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(streamed === Set(1L, 2L, 4L))
    // parity: the batch chain's first pass (q29 fingerprint groupBy,
    // keeper = min doc_id = first arrival; ingest order = id order here)
    // keeps exactly the rows the stream let through
    val batchKept = (b1 ++ b2).map(t => (t._1, t._2)).toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextAnalysis.fingerprintColumn.as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("keep_id"))
      .collect().map(_.getAs[Long]("keep_id")).toSet
    assert(batchKept === streamed)
  }

  test("streaming anomaly flagging matches batch q102 on a single-batch replay; silent below min-n") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val all = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[Ev].collect().toIndexedSeq
    // one batch = the stream has seen everything the batch job sees →
    // the flagged set must equal q102's (stats are all-seen-so-far)
    val mem = MemoryStream[Ev]
    val q = Streaming.anomaliesStateful(mem.toDS()).writeStream
      .format("memory").queryName("anom").outputMode(OutputMode.Append).start()
    try { mem.addData(all); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("anom").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val batch = ops.TimeSeries.q102Anomalies(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(streamed.keySet === batch.keySet)
    assert(batch.nonEmpty)
    streamed.foreach { case (id, z) =>
      assert(math.abs(z - batch(id)) < 1e-6, s"event $id z $z vs ${batch(id)}")
    }
    // below min-n the monitor stays silent — no "anomalies" against a
    // meaningless baseline
    val mem2 = MemoryStream[Ev]
    val q2 = Streaming.anomaliesStateful(mem2.toDS(), minN = 30L).writeStream
      .format("memory").queryName("anom2").outputMode(OutputMode.Append).start()
    try {
      mem2.addData(all.filter(_.event_type == all.head.event_type).take(10))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table("anom2").count() == 0L)
  }

  test("streaming quota cap admits first-N per source across micro-batches, matching the batch window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the sf0.001 documents table replayed in doc_id order over two
    // micro-batches: per-source admitted counts must carry across the
    // batch boundary (a source part-filled in batch 1 only gets the
    // REMAINDER in batch 2), and the union must equal the batch
    // first-N-per-source window over the same corpus.
    val cap = 3L
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source")).collect()
      .map(r => QuotaDoc(r.getLong(0), r.getString(1))).sortBy(_.doc_id)
    val (b1, b2) = all.splitAt(all.length / 2)
    val mem = MemoryStream[QuotaDoc]
    val q = Streaming.quotaCapStateful(mem.toDS(), cap).writeStream
      .format("memory").queryName("quota").outputMode(OutputMode.Append).start()
    try {
      mem.addData(b1.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(b2.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("quota").as[QuotaOut].collect()
      .map(o => (o.doc_id, o.source, o.rk)).toSet
    val batch = all.groupBy(_.source).values.flatMap(_.sortBy(_.doc_id).take(cap.toInt)
      .zipWithIndex.map { case (d, i) => (d.doc_id, d.source, i + 1L) }).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // every source respects the cap
    streamed.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.size <= cap, s"source $s over cap")
    }
  }

  test("streaming bloom-ingest dedups against the whole corpus history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sbloom")
      .toFile.getAbsolutePath
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (11L, "ALPHA beta: gamma!"), (12L, "zeta eta"))
    Streaming.bloomDedupIngest(mem.toDF().toDF("doc_id", "text"),
      s"$root/blocks", s"$root/fps", s"$root/novel", s"$root/ckpt")
    // a second AvailableNow run later: the bloom pair REMEMBERS batch 1
    // across queries/restarts (no watermark horizon) — 21 is an
    // all-time dup, only 22 is novel
    mem.addData((21L, "delta... EPSILON"), (22L, "brand new text"))
    Streaming.bloomDedupIngest(mem.toDF().toDF("doc_id", "text"),
      s"$root/blocks", s"$root/fps", s"$root/novel", s"$root/ckpt")
    // same checkpoint → same run=<id> namespace (checkpoint-derived, so
    // a restart's replayed batchIds hit their own marker dirs); batch
    // ids continue across runs, so the partitions never collide
    val novel = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/novel")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(novel == Set(1L, 2L, 12L, 22L))
  }

  test("streaming LSH-ingest drops near-dups of documents from earlier runs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_slsh")
      .toFile.getAbsolutePath
    def mk(n: Int, seed: Int): String =
      (0 until n).map(i => s"s${seed}t$i").mkString(" ")
    val a = mk(40, 1)
    val aNear = { val w = a.split(" "); w(7) = "edited"; w.mkString(" ") }
    val mem = MemoryStream[(Long, String)]
    mem.addData((1L, a), (2L, mk(40, 2)))
    Streaming.lshDedupIngest(mem.toDF().toDF("doc_id", "text"),
      s"$root/sigs", s"$root/bands", s"$root/novel", s"$root/ckpt")
    // later run: 11 is a NEAR-copy (not canonical-exact — bloom/q29
    // would keep it) of run-1's doc 1; 12 is novel
    mem.addData((11L, aNear), (12L, mk(40, 3)))
    Streaming.lshDedupIngest(mem.toDF().toDF("doc_id", "text"),
      s"$root/sigs", s"$root/bands", s"$root/novel", s"$root/ckpt")
    val novel = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$root/novel")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(novel == Set(1L, 2L, 12L))
  }

  test("ingest run namespace is derived from checkpoint identity, not per call") {
    val root = java.nio.file.Files.createTempDirectory("graft_runid")
      .toFile.getAbsolutePath
    val id1 = Streaming.runIdFor(spark, s"$root/ckptA")
    // a restart of the same checkpoint reuses the persisted nonce — the
    // property that lets a replayed batchId find its own marker dir
    assert(Streaming.runIdFor(spark, s"$root/ckptA") == id1)
    assert(new java.io.File(s"$root/ckptA/graft-run-id").exists())
    // a fresh checkpoint (batch ids restart at 0) gets its own namespace
    assert(Streaming.runIdFor(spark, s"$root/ckptB") != id1)
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // batch 1: two sessions' worth of data for user 1 (gap at 45min)
    mem.addData(Ev(1, 1, "a", ts(0), 1.5), Ev(2, 1, "a", ts(10), 2.5), Ev(3, 1, "a", ts(60), 4.0))
    val q = Streaming.sessionizeStateful(mem.toDS()).writeStream
      .format("memory").queryName("smg").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // session 1 closed by the in-batch gap
      val r1 = spark.table("smg").collect()
      assert(r1.length === 1)
      assert(r1(0).getAs[Long]("n_events") === 2L)
      assert(r1(0).getAs[Double]("sum_value") === 4.0)
      // batch 2: watermark jump times out the open session
      mem.addData(Ev(9, 2, "a", ts(100 * 60), 0.0))
      q.processAllAvailable()
      mem.addData(Ev(10, 2, "a", ts(101 * 60), 0.0))
      q.processAllAvailable()
      val r2 = spark.table("smg").filter(col("user_id") === 1).orderBy("start").collect()
      assert(r2.length === 2)
      assert(r2(1).getAs[Long]("n_events") === 1L)
    } finally q.stop()
  }

  test("stream-stream interval join: clicks within 15 minutes of a view") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "view", ts(0), 0.0),   // view by user 1
      Ev(2, 1, "click", ts(5), 0.0),  // within 15m → joins
      Ev(3, 1, "click", ts(40), 0.0), // outside 15m → no join
      Ev(4, 2, "click", ts(6), 0.0))  // other user → no join
    runToMemory(Streaming.viewClickJoin(mem.toDF()), "ssjoin")
    val rows = spark.table("ssjoin")
      .select("view_id", "click_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((1L, 2L)))
  }

  test("stream-stream left-outer join emits unmatched views after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "view", ts(0), 0.0),  // will match
      Ev(2, 1, "click", ts(5), 0.0),
      Ev(3, 2, "view", ts(1), 0.0))  // never matches
    val q = Streaming.viewClickJoin(mem.toDF(), "leftOuter").writeStream
      .format("memory").queryName("ssouter").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      // advance BOTH branch watermarks (global watermark is their min)
      // far past view+interval+delay to force the null-padded emission
      mem.addData(Ev(9, 3, "view", ts(300), 0.0), Ev(10, 3, "click", ts(300), 0.0))
      q.processAllAvailable()
      mem.addData(Ev(11, 4, "view", ts(301), 0.0), Ev(12, 4, "click", ts(301), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssouter")
        .select("view_id", "click_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((1L, 2L)))
      assert(rows.contains((3L, -1L)), s"unmatched view not emitted: $rows")
    } finally q.stop()
  }

  test("stream-stream full-outer join null-pads BOTH unmatched sides") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(1, 1, "view", ts(0), 0.0),   // matches click 2
      Ev(2, 1, "click", ts(5), 0.0),
      Ev(3, 2, "view", ts(1), 0.0),   // unmatched view → (3, null)
      Ev(4, 5, "click", ts(2), 0.0))  // unmatched click → (null, 4)
    val q = Streaming.viewClickJoin(mem.toDF(), "fullOuter").writeStream
      .format("memory").queryName("ssfull").outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      mem.addData(Ev(9, 3, "view", ts(300), 0.0), Ev(10, 3, "click", ts(300), 0.0))
      q.processAllAvailable()
      mem.addData(Ev(11, 4, "view", ts(301), 0.0), Ev(12, 4, "click", ts(301), 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssfull")
        .select("view_id", "click_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((1L, 2L)))
      assert(rows.contains((3L, -1L)), s"unmatched view not emitted: $rows")
      assert(rows.contains((-1L, 4L)), s"unmatched click not emitted: $rows")
    } finally q.stop()
  }

  test("streaming dedup parity: dropDuplicatesWithinWatermark equals batch exact dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // duplicate event_ids across micro-batches, all within the watermark
    mem.addData(Ev(1, 1, "a", ts(0), 1.0), Ev(2, 1, "a", ts(1), 1.0), Ev(1, 1, "a", ts(2), 1.0))
    mem.addData(Ev(2, 2, "a", ts(3), 1.0), Ev(3, 2, "a", ts(4), 1.0))
    runToMemory(Streaming.dedupedWithinWatermark(mem.toDF()), "sdedup")
    val streamIds = spark.table("sdedup").select("event_id").collect().map(_.getLong(0)).sorted
    assert(streamIds.toSeq === Seq(1L, 2L, 3L)) // one survivor per id, like batch dropDuplicates
  }

  test("rate-micro-batch source drives a windowed aggregation (§2B scans row)") {
    // rate-micro-batch is the deterministic form of the rate source: a
    // fixed rowsPerBatch with timestamps advancing a fixed step per
    // batch — the built-in generator for load tests and smoke streams.
    val rate = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "10")
      .option("numPartitions", "2")
      .option("startTimestamp", "0")
      .option("advanceMillisPerBatch", "60000")
      .load()
    val agg = rate
      .withWatermark("timestamp", "0 seconds")
      .groupBy(window(col("timestamp"), "1 minute"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w"), col("n"), col("sum_v"))
    val q = agg.writeStream.format("memory").queryName("rate_agg")
      .outputMode(OutputMode.Complete).trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val rows = spark.table("rate_agg").orderBy("w").collect()
    assert(rows.nonEmpty)
    // every complete 1-minute window holds exactly one 10-row batch with
    // consecutive values, so counts and sums are fully deterministic
    assert(rows.head.getAs[Long]("n") === 10L)
    assert(rows.head.getAs[Long]("sum_v") === (0L until 10L).sum)
  }

  test("stateful gap fill matches batch q118 once the watermark closes every day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("value"))
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val expect = ops.TimeSeries.q118GapFill(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getDouble(2), r.getInt(3))).toSet
    val (b1, b2) = evs.splitAt(evs.length / 2)
    val mem = MemoryStream[Ev]
    val q = Streaming.gapFillStateful(mem.toDS()).writeStream
      .format("memory").queryName("gapfill").outputMode(OutputMode.Append).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      // two sentinel batches: the first advances the watermark past every
      // open day, the second gives the engine a batch to fire timers in
      val far = new Timestamp(evs.map(_.ts.getTime).max + 100L * 86400000L)
      mem.addData(Ev(9000001, 9000001, "x", far, 0.0)); q.processAllAvailable()
      mem.addData(Ev(9000002, 9000001, "x", new Timestamp(far.getTime + 1000), 0.0))
      q.processAllAvailable()
      val got = spark.table("gapfill").filter(col("user_id") < 9000000L).collect()
        .map(r => (r.getLong(0), r.getAs[Timestamp](1).getTime, r.getDouble(2), r.getInt(3)))
        .toSet
      assert(got === expect,
        s"stream/batch diverge: ${got.diff(expect).take(3)} vs ${expect.diff(got).take(3)}")
    } finally q.stop()
  }

  test("batch/stream parity: hourlyStats over the events table") {
    val sf = "/root/testdata/sf0.001"
    val batchEvents = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    val expect = Streaming.hourlyStats(batchEvents)
      .orderBy("hour_start", "event_type").collect().toSeq
    // stream the same rows through a file stream (AvailableNow drain)
    val tmp = java.nio.file.Files.createTempDirectory("evstream").toString
    batchEvents.write.mode("overwrite").parquet(s"$tmp/in")
    val streamIn = spark.readStream.schema(batchEvents.schema).parquet(s"$tmp/in")
    val q = Streaming.hourlyStats(streamIn).writeStream
      .format("memory").queryName("parity").outputMode(OutputMode.Complete)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$tmp/ckpt").start()
    try q.awaitTermination() finally q.stop()
    val got = spark.table("parity").orderBy("hour_start", "event_type").collect().toSeq
    assert(got === expect)
  }
}
