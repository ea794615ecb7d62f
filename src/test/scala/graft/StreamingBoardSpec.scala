package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.StreamingBoard

/** Pins what the q146-q148 oracle hashes can't see: that the
  * materialized streaming rows really executed MULTIPLE micro-batches
  * (so the hash-green output is evidence of cross-batch state carry and
  * of timers fired by watermark advancement, not of a single-batch
  * degenerate run). Batch count is read from the checkpoint's offsets
  * log — one offset file per started micro-batch, the engine's own
  * source of truth. Result equality vs the batch twins is the DuckDB
  * oracle's job at sf0.01; here it is re-asserted at sf0.001 so the
  * file-delivery protocol (mod-time ordering + maxFilesPerTrigger=1) is
  * covered by `sbt test` as well. */
class StreamingBoardSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-board-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  /** Completed micro-batch count = offset log entries (files named by
    * batch id under ckpt/offsets). */
  private def nBatches(root: String): Int =
    new java.io.File(s"$root/ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))

  test("q146 runs the quota cap across >=2 micro-batches and equals the batch window") {
    val root = java.nio.file.Files.createTempDirectory("graft_q146spec").toString
    val got = StreamingBoard.q146Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(nBatches(root) >= 2, "quota stream must span micro-batches")
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.flatMap(_.sortBy(_._1).take(10).zipWithIndex
        .map { case ((id, s), i) => (id, s, i + 1L) }).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q148 fires every day-close timer (4 delivered files) and equals batch q118") {
    val root = java.nio.file.Files.createTempDirectory("graft_q148spec").toString
    val got = StreamingBoard.q148Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getDouble(2), r.getInt(3))).toSet
    assert(nBatches(root) >= 4, "two data + two sentinel batches expected")
    val expect = ops.TimeSeries.q118GapFill(spark, sf).collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getDouble(2), r.getInt(3))).toSet
    assert(got === expect,
      s"stream/batch diverge: ${got.diff(expect).take(3)} vs ${expect.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q148 crash-recovery: stop mid-stream, restart from the checkpoint, identical final sink") {
    import org.apache.spark.sql.streaming.Trigger
    // uninterrupted reference run
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q148ref").toString
    val want = StreamingBoard.q148Impl(spark, sf, refRoot).collect().map(_.toSeq).toSeq
    // interrupted run: stage only the two DATA files, start, stop the
    // query as soon as the first micro-batch commits (recentProgress-
    // independent: the commits log is the engine's own record), then
    // stage the sentinel files and RESTART from the same checkpoint —
    // the recovery path a real deployment exercises weekly. The file
    // sink's _spark_metadata log must make the interruption invisible.
    val root = java.nio.file.Files.createTempDirectory("graft_q148recov").toString
    val schema = StreamingBoard.q148Stage(spark, sf, root, upTo = 2)
    def start() = StreamingBoard.q148Query(spark, schema, root).writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    val q1 = start()
    val commits = new java.io.File(s"$root/ckpt/commits")
    val deadline = System.currentTimeMillis() + 60000
    while ((!commits.exists() ||
        commits.listFiles().count(_.getName.forall(_.isDigit)) < 1) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    q1.stop()
    q1.awaitTermination()
    val stoppedAt = nBatches(root)
    assert(stoppedAt >= 1 && stoppedAt <= 2,
      s"interruption landed after $stoppedAt batches — expected 1-2 (data files only)")
    // deliver the rest and restart from the same checkpoint
    StreamingBoard.q148Stage(spark, sf, root, upTo = 4)
    val q2 = start()
    q2.awaitTermination()
    assert(nBatches(root) >= 4, "restart must process the remaining files + sentinels")
    val got = StreamingBoard.q148Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.toSeq).toSeq
    assert(got.toSet === want.toSet,
      s"recovered sink diverges: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    assert(got.nonEmpty)
  }

  test("q150 crash-recovery: open sessions survive a restart from the checkpointed state") {
    import org.apache.spark.sql.streaming.Trigger
    // reference run, uninterrupted
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q150ref").toString
    val want = StreamingBoard.q150Impl(spark, sf, refRoot).collect().map(_.toSeq).toSeq
    // interrupted run: the q148 protocol, but here the interruption is
    // STRICTLY harder — sessions whose events straddle the early/late
    // midpoint split are OPEN inside the state store when the query
    // stops, and the restart must resume them from the checkpoint (not
    // re-open fresh ones, which would split those sessions in two and
    // change n_events/sum_value)
    val root = java.nio.file.Files.createTempDirectory("graft_q150recov").toString
    val schema = StreamingBoard.q150Stage(spark, sf, root, upTo = 2)
    def start() = StreamingBoard.q150Query(spark, schema, root).writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    val q1 = start()
    val commits = new java.io.File(s"$root/ckpt/commits")
    val deadline = System.currentTimeMillis() + 60000
    while ((!commits.exists() ||
        commits.listFiles().count(_.getName.forall(_.isDigit)) < 1) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    q1.stop()
    q1.awaitTermination()
    // the interruption left real work IN STATE: timers fire only after
    // the sentinel batches, so the sink at this point must be missing
    // sessions that only the restarted query (resuming the checkpointed
    // state) can emit
    val atInterruption =
      try StreamingBoard.q150Post(spark.read.parquet(s"$root/out")).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    assert(atInterruption < want.size,
      s"all ${want.size} sessions already emitted before the restart — nothing was open in state")
    StreamingBoard.q150Stage(spark, sf, root, upTo = 4)
    val q2 = start()
    q2.awaitTermination()
    assert(nBatches(root) >= 4, "restart must process the remaining files + sentinels")
    val got = StreamingBoard.q150Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.toSeq).toSeq
    assert(got.toSet === want.toSet,
      s"recovered sessions diverge: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    assert(got.size > atInterruption,
      "the restarted query emitted nothing — open sessions were not recovered from state")
  }

  test("q146 crash-recovery: part-filled admission counters resume from the checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    // cut after the 97 smallest doc_ids: every source sits PART-WAY
    // through its quota at the file boundary (~5 of 10 admitted), so a
    // restart that reset the counters would re-admit cap more rows per
    // source with duplicate ranks — the strictest admission scenario
    val cut = 97
    // uninterrupted reference over the SAME split
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q146ref").toString
    val refSchema = StreamingBoard.q146Stage(spark, sf, refRoot, upTo = 2, loCount = Some(cut))
    def run(root: String, schema: org.apache.spark.sql.types.StructType) = {
      val q = StreamingBoard.q146Query(spark, schema, root).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run(refRoot, refSchema)
    val want = StreamingBoard.q146Post(spark.read.parquet(s"$refRoot/out"))
      .collect().map(_.toSeq).toSet
    // interrupted run: deliver ONLY the first file, drain to a
    // deterministic stop (AvailableNow ends with every counter mid-way),
    // then deliver the second file and restart from the checkpoint
    val root = java.nio.file.Files.createTempDirectory("graft_q146recov").toString
    val schema = StreamingBoard.q146Stage(spark, sf, root, upTo = 1, loCount = Some(cut))
    run(root, schema)
    assert(nBatches(root) == 1, "one delivered file = one batch before the interruption")
    val mid = spark.read.parquet(s"$root/out")
    val partFilled = mid.groupBy(col("source")).agg(max(col("rk")).as("m"))
      .filter(col("m") < 10).count()
    assert(partFilled > 0,
      "no source was part-filled at the interruption — the resume case went untested")
    StreamingBoard.q146Stage(spark, sf, root, upTo = 2, loCount = Some(cut))
    run(root, schema)
    assert(nBatches(root) >= 2, "restart must process the second file")
    val got = StreamingBoard.q146Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.toSeq).toSet
    assert(got === want,
      s"recovered admissions diverge: ${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    // counter reset would also surface as duplicate (source, rk) pairs
    val dups = spark.read.parquet(s"$root/out")
      .groupBy(col("source"), col("rk")).count().filter(col("count") > 1).count()
    assert(dups == 0, "duplicate ranks — admission counters restarted from zero")
    // and the online semantics still equal the batch first-N window
    val batchWin = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.flatMap(_.sortBy(_._1).take(10).zipWithIndex
        .map { case ((id, s), i) => Seq(id, s, i + 1L) }).toSet
    assert(got === batchWin)
  }

  test("q147 crash-recovery: per-type moment state (NoTimeout) survives a restart") {
    import org.apache.spark.sql.streaming.Trigger
    // two-file delivery (event-time halves). The recovery contract: a
    // query stopped after batch 1 and restarted from its checkpoint
    // flags batch 2 against moments that INCLUDE batch 1's (n, Σx, Σx²)
    // — identical to the uninterrupted two-batch run. (The board row
    // stays the single-batch replay; this pins the state round-trip.)
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q147ref").toString
    val refSchema = StreamingBoard.q147Stage(spark, sf, refRoot, upTo = 2)
    def start(root: String, schema: org.apache.spark.sql.types.StructType) =
      StreamingBoard.q147Query(spark, schema, root).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
    val qr = start(refRoot, refSchema); qr.awaitTermination()
    assert(nBatches(refRoot) >= 2, "reference must span micro-batches")
    val want = StreamingBoard.q147Post(spark.read.parquet(s"$refRoot/out"))
      .collect().map(_.toSeq).toSeq
    assert(want.nonEmpty, "no anomalies at all — the parity check would be vacuous")
    // interrupted run: stage file 1 only, drain (deterministic stop with
    // all moment state mid-corpus), stage file 2, restart
    val root = java.nio.file.Files.createTempDirectory("graft_q147recov").toString
    val schema = StreamingBoard.q147Stage(spark, sf, root, upTo = 1)
    val q1 = start(root, schema); q1.awaitTermination()
    assert(nBatches(root) == 1)
    StreamingBoard.q147Stage(spark, sf, root, upTo = 2)
    val q2 = start(root, schema); q2.awaitTermination()
    assert(nBatches(root) >= 2, "restart must process the second file")
    val got = StreamingBoard.q147Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.toSeq).toSeq
    assert(got.toSet === want.toSet,
      s"recovered flags diverge: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    // non-vacuity: batch 2 contributed flags, and every event type
    // straddles the split — so those flags' moments necessarily fold the
    // RELOADED batch-1 state, not a fresh zero
    val evs = Tables.events(spark, sf).select(col("ts").cast("timestamp").as("ts"), col("event_type"))
    val mm = evs.agg(min(col("ts")), max(col("ts"))).head
    val midTs = new java.sql.Timestamp(
      mm.getTimestamp(0).getTime + (mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime) / 2)
    val straddle = evs.groupBy(col("event_type"))
      .agg(sum(when(col("ts") <= midTs, 1).otherwise(0)).as("lo"),
        sum(when(col("ts") > midTs, 1).otherwise(0)).as("hi"))
      .filter(col("lo") === 0 || col("hi") === 0).count()
    assert(straddle == 0, "every event type must have events in both halves")
  }

  test("q163 interval-join stream spans >=2 micro-batches and equals batch q155 exactly") {
    val root = java.nio.file.Files.createTempDirectory("graft_q163spec").toString
    val got = StreamingBoard.q163Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(nBatches(root) >= 2, "session intervals must arrive across micro-batches")
    val want = ops.TimeSeries.q155IntervalJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got.nonEmpty && got.toSet === want.toSet,
      s"stream/batch diverge: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
    // exactly-once survives the batch split: no pair appears twice
    assert(got.distinct.size == got.size, "duplicate pairs across micro-batches")
  }

  test("q163 restart: the stateless interval join neither loses nor duplicates pairs across a checkpoint restart") {
    import org.apache.spark.sql.streaming.Trigger
    // stateless recovery is carried by the SOURCE's seen-file log and
    // the SINK's _spark_metadata commit log, not a state store — this
    // pins that the exactly-once contract survives the same
    // deliver-1 / drain / deliver-2 / restart protocol the stateful
    // matrix uses
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q163ref").toString
    val want = StreamingBoard.q163Impl(spark, sf, refRoot).collect().map(_.toSeq).toSet
    val root = java.nio.file.Files.createTempDirectory("graft_q163recov").toString
    val schema = StreamingBoard.q163Stage(spark, sf, root, upTo = 1)
    def run(): Unit = {
      val q = StreamingBoard.q163Query(spark, schema, sf, root).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    assert(nBatches(root) == 1)
    val atInterruption = spark.read.parquet(s"$root/out").count()
    StreamingBoard.q163Stage(spark, sf, root, upTo = 2)
    run()
    assert(nBatches(root) >= 2, "restart must process the second file")
    val got = StreamingBoard.q163Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.toSeq)
    assert(got.toSet === want, s"restart changed the pair set: " +
      s"${got.toSet.diff(want).take(3)} vs ${want.diff(got.toSet).take(3)}")
    assert(got.distinct.size == got.size, "restart duplicated pairs")
    assert(got.size > atInterruption,
      "second file contributed nothing — the restart leg went untested")
  }

  test("q165 content-dedup stream suppresses cross-batch redeliveries and emits each fingerprint once") {
    val root = java.nio.file.Files.createTempDirectory("graft_q165spec").toString
    val got = StreamingBoard.q165Impl(spark, sf, root).collect().map(_.getString(0)).toSeq
    assert(nBatches(root) >= 2, "documents must arrive across micro-batches")
    // non-vacuity: the delivery really contained MORE rows than
    // fingerprints (batch 2 redelivers every 7th batch-1 doc), so the
    // admitted set being exactly the distinct-fp set proves suppression
    val delivered = spark.read.parquet(s"$root/in").count()
    val want = Tables.documents(spark, sf)
      .select(text.TextAnalysis.fingerprintColumn.as("fp"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    assert(delivered > want.size,
      s"staging delivered no redeliveries ($delivered rows vs ${want.size} fps) — the dedup is vacuous")
    assert(got == want,
      s"admitted fingerprint set diverges: ${got.size} vs ${want.size}")
    assert(got.distinct.size == got.size, "a fingerprint was emitted twice")
    // every ADMITTED row's doc_id belongs to its fingerprint's class
    // (which member wins is engine scheduling; membership is semantics)
    val sink = spark.read.parquet(s"$root/out")
    val classes = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        text.TextAnalysis.fingerprintColumn.as("fp"))
    val strays = sink.join(classes, Seq("doc_id", "fp"), "left_anti").count()
    assert(strays == 0, s"$strays admitted rows carry a fingerprint their doc does not have")
  }

  test("q165 crash-recovery: fingerprint state survives a restart and still suppresses batch-2 redeliveries") {
    import org.apache.spark.sql.streaming.Trigger
    // the one state-store type the crash matrix did not cover (r11
    // verdict item 2): the dropDuplicatesWithinWatermark dedup store.
    // Deliver batch 1, drain, deliver batch 2 (upper half + redelivered
    // batch-1 docs), RESTART from the checkpoint: if the fingerprint
    // state were lost, every redelivered doc would be re-admitted and
    // the final fp multiset would carry duplicates.
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q165ref").toString
    val want = StreamingBoard.q165Impl(spark, sf, refRoot).collect().map(_.getString(0)).toSeq
    val root = java.nio.file.Files.createTempDirectory("graft_q165recov").toString
    val schema = StreamingBoard.q165Stage(spark, sf, root, upTo = 1)
    def run(): Unit = {
      val q = StreamingBoard.q165Query(spark, schema, root).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    // a watermark-stateful query may append a no-data batch after the
    // file batch (watermark advance/eviction pass) — count deltas, not
    // absolutes
    val batchesAtStop = nBatches(root)
    assert(batchesAtStop >= 1)
    val atInterruption = spark.read.parquet(s"$root/out").count()
    assert(atInterruption > 0 && atInterruption < want.size,
      s"interruption admitted $atInterruption of ${want.size} — batch 1 must be a strict subset")
    StreamingBoard.q165Stage(spark, sf, root, upTo = 2)
    run()
    assert(nBatches(root) > batchesAtStop, "restart must process the second file")
    val got = StreamingBoard.q165Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.getString(0)).toSeq
    assert(got == want, s"restart changed the admitted set: ${got.size} vs ${want.size}")
    assert(got.distinct.size == got.size,
      "a redelivered fingerprint was re-admitted after the restart — state was lost")
  }

  /** Batch reference pairs for the q170/q171 family: (user_id,
    * click_id, error_id, click_ts, error_ts) under the 60-minute
    * forward range. */
  private def ssjPairs(): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_uid"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    c.join(e, col("user_id") === col("e_uid") &&
      col("error_ts") >= col("click_ts") &&
      col("error_ts") <= col("click_ts") + expr("interval 60 minutes"))
      .select(col("user_id"), col("click_id"), col("error_id"),
        col("click_ts"), col("error_ts"))
  }

  test("q170 stream-stream inner join spans >=2 micro-batches, equals the batch join, and completes a straddling pair") {
    val root = java.nio.file.Files.createTempDirectory("graft_q170spec").toString
    val got = StreamingBoard.q170Impl(spark, sf, root, "inner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(nBatches(root) >= 2, "the feed must arrive across micro-batches")
    val want = ssjPairs().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want, s"stream/batch diverge: " +
      s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(got.nonEmpty)
    // non-vacuity: >=1 emitted pair STRADDLES the file boundary (click
    // buffered in batch 1, error arriving in batch 2) — the staged cut
    // guarantees this by construction; re-assert it from the actual
    // staged files so the guarantee is tested, not trusted
    val early = spark.read.parquet(s"$root/in/00-early.parquet")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val late = spark.read.parquet(s"$root/in/01-late.parquet")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val straddling = want.count { case (_, cid, eid) =>
      early.contains(cid) && late.contains(eid) }
    assert(straddling > 0,
      "no emitted pair straddles the micro-batch boundary — state carry is untested")
  }

  test("q170 restart: symmetric-hash-join buffers survive a checkpoint restart (straddling pairs still complete)") {
    import org.apache.spark.sql.streaming.Trigger
    // the last uncovered state-store type in the crash matrix: the
    // stream-stream join's per-side keyed row buffers. Deliver file 1,
    // drain (clicks near the cut are now buffered state), deliver file
    // 2, RESTART from the checkpoint: if the buffers were lost, every
    // straddling pair would be lost with them.
    val refRoot = java.nio.file.Files.createTempDirectory("graft_q170ref").toString
    val want = StreamingBoard.q170Impl(spark, sf, refRoot, "inner")
      .collect().map(_.toSeq).toSet
    val root = java.nio.file.Files.createTempDirectory("graft_q170recov").toString
    val (schema, _) = StreamingBoard.q170Stage(spark, sf, root, upTo = 1)
    def run(): Unit = {
      val q = StreamingBoard.q170Query(spark, schema, root, "inner").writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val batchesAtStop = nBatches(root)
    assert(batchesAtStop >= 1)
    val atInterruption = spark.read.parquet(s"$root/out").count()
    StreamingBoard.q170Stage(spark, sf, root, upTo = 2)
    run()
    assert(nBatches(root) > batchesAtStop, "restart must process the second file")
    val got = StreamingBoard.q170Post(spark.read.parquet(s"$root/out"))
      .collect().map(_.toSeq)
    assert(got.toSet === want, s"restart changed the pair set: " +
      s"${got.toSet.diff(want).take(3)} vs ${want.diff(got.toSet).take(3)}")
    assert(got.distinct.size == got.size, "restart duplicated pairs")
    assert(got.size > atInterruption,
      "the restarted leg emitted nothing new — the straddle went untested")
  }

  test("q171 left-outer stream-stream join: matched pairs plus exactly the watermark-expired null emissions") {
    val root = java.nio.file.Files.createTempDirectory("graft_q171spec").toString
    val got = StreamingBoard.q171Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(nBatches(root) >= 2)
    // the emission gate, computed independently: global watermark =
    // least(max click_ts, max error_ts) - 30 min delay; an unmatched
    // click emits iff click_ts + 60 min range < watermark
    val ev = Tables.events(spark, sf)
    def maxTs(tpe: String): java.time.LocalDateTime =
      ev.filter(col("event_type") === tpe).agg(max(col("ts"))).head
        .getAs[java.time.LocalDateTime](0)
    val wm = Seq(maxTs("click"), maxTs("error")).min(
      Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      .minusMinutes(30)
    val matched = ssjPairs().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val matchedClicks = matched.map(_._2)
    val unmatchedEmitted = ev.filter(col("event_type") === "click")
      .filter(col("ts") + expr("interval 60 minutes") < lit(wm))
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), -1L))
      .filterNot(t => matchedClicks.contains(t._2)).toSet
    val want = matched ++ unmatchedEmitted
    assert(got === want, s"emitted set diverges: " +
      s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(got.exists(_._3 == -1L), "no null-padded emission — the outer path is untested")
    assert(got.exists(_._3 != -1L), "no matched emission")
  }

  test("q175 left-semi stream-stream join: at-most-once emission equals the batch semi join; a buffered click matches across the boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft_q175spec").toString
    val gotRows = StreamingBoard.q175Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(nBatches(root) >= 2)
    // at-most-once: semi may never emit a click twice even though
    // multiple errors match it
    assert(gotRows.distinct.length == gotRows.length, "semi join emitted a click twice")
    val got = gotRows.toSet
    val want = ssjPairs().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, s"semi diverges from batch existence: " +
      s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(got.nonEmpty)
    // non-vacuity: >=1 emitted click sat in batch 1 with ALL its
    // matching errors in batch 2 — it can only be in the sink if the
    // buffered click state survived the boundary
    val early = spark.read.parquet(s"$root/in/00-early.parquet")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val matchesOf = ssjPairs().collect()
      .map(r => (r.getLong(1), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val straddling = got.count { case (_, cid) =>
      early.contains(cid) && matchesOf(cid).forall(e => !early.contains(e)) }
    assert(straddling > 0,
      "no emitted click matched purely across the boundary — buffered-state carry untested")
  }

  test("q172 full-outer stream-stream join: asymmetric gates — clicks wait out the range, errors expire at their own ts") {
    val root = java.nio.file.Files.createTempDirectory("graft_q172spec").toString
    // key rows as (user_id, click_id|-1, error_id|-1)
    val got = StreamingBoard.q172Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(nBatches(root) >= 2)
    val ev = Tables.events(spark, sf)
    def maxTs(tpe: String): java.time.LocalDateTime =
      ev.filter(col("event_type") === tpe).agg(max(col("ts"))).head
        .getAs[java.time.LocalDateTime](0)
    val wm = Seq(maxTs("click"), maxTs("error")).min(
      Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      .minusMinutes(30)
    val matched = ssjPairs().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val matchedClicks = matched.map(_._2)
    val matchedErrors = matched.map(_._3)
    // left gate (q171's): unmatched click emits iff its whole forward
    // range horizon is behind the watermark
    val expiredClicks = ev.filter(col("event_type") === "click")
      .filter(col("ts") + expr("interval 60 minutes") < lit(wm))
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), -1L))
      .filterNot(t => matchedClicks.contains(t._2)).toSet
    // right gate: an error's candidate clicks all have click_ts <=
    // error_ts, so it expires the moment the watermark passes error_ts
    val expiredErrors = ev.filter(col("event_type") === "error")
      .filter(col("ts") < lit(wm))
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), -1L, r.getLong(1)))
      .filterNot(t => matchedErrors.contains(t._3)).toSet
    val want = matched ++ expiredClicks ++ expiredErrors
    assert(got === want, s"emitted set diverges: " +
      s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    // non-vacuity: all three emission classes must be live
    assert(got.exists(t => t._2 != -1L && t._3 != -1L), "no matched emission")
    assert(got.exists(_._3 == -1L), "no null-error emission — the left-outer path is untested")
    assert(got.exists(_._2 == -1L), "no null-click emission — the right-outer path is untested")
  }

  test("q173 transformWithState sessionizer equals the v1 flatMapGroupsWithState twin row-for-row (RocksDB store)") {
    val rootV2 = java.nio.file.Files.createTempDirectory("graft_q173spec").toString
    val gotV2 = StreamingBoard.q173Impl(spark, sf, rootV2).collect().map(_.toSeq).toSeq
    assert(nBatches(rootV2) >= 4,
      "the v2 run must see both data files and both sentinel batches")
    // the board run must actually have used RocksDB (the conf is
    // restored afterwards — read the checkpoint's recorded offsets conf)
    val offsets = new java.io.File(s"$rootV2/ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    val conf = scala.io.Source.fromFile(offsets.head).getLines().mkString("\n")
    assert(conf.contains("RocksDBStateStoreProvider"),
      "q173 did not run on the RocksDB state store provider")
    val rootV1 = java.nio.file.Files.createTempDirectory("graft_q173v1").toString
    val gotV1 = StreamingBoard.q150Impl(spark, sf, rootV1).collect().map(_.toSeq).toSeq
    assert(gotV2.toSet === gotV1.toSet, s"v2/v1 sessionizers diverge: " +
      s"${gotV2.toSet.diff(gotV1.toSet).take(3)} vs ${gotV1.toSet.diff(gotV2.toSet).take(3)}")
    assert(gotV2.size == gotV1.size && gotV2.nonEmpty)
  }

  test("q173 crash-recovery: RocksDB ValueState + registered timers survive a checkpoint restart") {
    import org.apache.spark.sql.streaming.Trigger
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val refRoot = java.nio.file.Files.createTempDirectory("graft_q173ref").toString
      val want = StreamingBoard.q173Impl(spark, sf, refRoot).collect().map(_.toSeq).toSeq
      val root = java.nio.file.Files.createTempDirectory("graft_q173recov").toString
      val schema = StreamingBoard.q150Stage(spark, sf, root, upTo = 2)
      def start() = StreamingBoard.q173Query(spark, schema, root).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      val q1 = start()
      val commits = new java.io.File(s"$root/ckpt/commits")
      val deadline = System.currentTimeMillis() + 60000
      while ((!commits.exists() ||
          commits.listFiles().count(_.getName.forall(_.isDigit)) < 1) &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      q1.stop()
      q1.awaitTermination()
      // sessions straddling the midpoint (and every timer) are still in
      // the RocksDB store when the query stops — the sink must be short
      val atInterruption =
        try StreamingBoard.q150Post(spark.read.parquet(s"$root/out")).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      assert(atInterruption < want.size,
        s"all ${want.size} sessions already emitted before the restart — nothing was open in state")
      StreamingBoard.q150Stage(spark, sf, root, upTo = 4)
      val q2 = start()
      q2.awaitTermination()
      assert(nBatches(root) >= 4, "restart must process the remaining files + sentinels")
      val got = StreamingBoard.q150Post(spark.read.parquet(s"$root/out"))
        .collect().map(_.toSeq).toSeq
      assert(got.toSet === want.toSet,
        s"recovered v2 sessions diverge: ${got.toSet.diff(want.toSet).take(3)} vs ${want.toSet.diff(got.toSet).take(3)}")
      assert(got.size > atInterruption,
        "the restarted leg emitted nothing new — no open state was recovered")
    } finally spark.conf.set(providerKey, prevProvider)
  }

  test("q178 composite-state histograms reconcile exactly with the v1 sessionizer's sessions") {
    val root = java.nio.file.Files.createTempDirectory("graft_q178spec").toString
    val hist = StreamingBoard.q178Impl(spark, sf, root).collect()
      .map(r => ((r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2)), r.getString(3), r.getLong(4)))
    assert(nBatches(root) >= 4, "data files + both sentinel batches must deliver")
    assert(hist.nonEmpty)
    // the histogram's per-session totals must equal the v1 sessionizer's
    // n_events session for session — two independent state models (one
    // packed record vs ValueState+MapState column families) agreeing on
    // every (user, session, type) count
    val rootV1 = java.nio.file.Files.createTempDirectory("graft_q178v1").toString
    val sessions = StreamingBoard.q150Impl(spark, sf, rootV1).collect()
      .map(r => ((r.getLong(0), r.getAs[java.time.LocalDateTime](2),
        r.getAs[java.time.LocalDateTime](3)), r.getLong(1))).toMap
    val totals = hist.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(totals === sessions, s"histogram totals diverge from sessions: " +
      s"${totals.toSet.diff(sessions.toSet).take(3)} vs ${sessions.toSet.diff(totals.toSet).take(3)}")
    // and at least one session genuinely has >1 event type (the map did work)
    assert(hist.groupBy(_._1).exists(_._2.map(_._2).distinct.size > 1),
      "no multi-type session — the MapState never held more than one key")
  }

  test("q179 pattern detection: a triple cut at its click still fires — ListState carries across the boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft_q179spec").toString
    val got = StreamingBoard.q179Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(nBatches(root) >= 2)
    assert(got.nonEmpty)
    // >=1 hit must have its purchase in batch 2 and view+click in batch
    // 1 — the staged cut guarantees one by construction; re-assert from
    // the actual files
    val early = spark.read.parquet(s"$root/in/00-early.parquet")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val straddling = got.count { case (_, v, c, p) =>
      early.contains(v) && early.contains(c) && !early.contains(p) }
    assert(straddling > 0,
      "no hit straddles the micro-batch boundary — ListState carry untested")
  }

  test("q179 restart: the ListState recent-events buffer survives a checkpoint restart") {
    import org.apache.spark.sql.streaming.Trigger
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val refRoot = java.nio.file.Files.createTempDirectory("graft_q179ref").toString
      val want = StreamingBoard.q179Impl(spark, sf, refRoot).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val root = java.nio.file.Files.createTempDirectory("graft_q179recov").toString
      val schema = StreamingBoard.q179Stage(spark, sf, root, upTo = 1)
      import spark.implicits._
      def start() = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/in").as[graft.streaming.Ev]
        graft.streaming.StateV2.patternTws(stream).writeStream
          .format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
      }
      val q1 = start(); q1.awaitTermination()
      val atInterruption =
        try spark.read.parquet(s"$root/out").count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      StreamingBoard.q179Stage(spark, sf, root, upTo = 2)
      val q2 = start(); q2.awaitTermination()
      val gotRows = spark.read.parquet(s"$root/out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val got = gotRows.toSet
      assert(gotRows.distinct.length == gotRows.length, "restart duplicated hits")
      assert(got === want, s"restart changed the hit set: " +
        s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
      assert(got.size > atInterruption,
        "the restarted leg emitted nothing new — the straddling triple went untested")
    } finally spark.conf.set(providerKey, prevProvider)
  }

  test("q183 maintains the MV across >=3 micro-batch MERGEs and equals batch recomputation") {
    val root = java.nio.file.Files.createTempDirectory("graft_q183spec").toString
    val got = StreamingBoard.q183Impl(spark, sf, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(nBatches(root) >= 3, "the MV must be folded across >=3 epochs")
    val want = Tables.events(spark, sf).groupBy(col("user_id")).agg(
        count(lit(1)).as("n"), min(unix_micros(col("ts").cast("timestamp"))).as("f"),
        max(unix_micros(col("ts").cast("timestamp"))).as("l"), max(col("value")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got === want, s"MV diverges from recomputation: " +
      s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("q194 MOR-maintained MV: epochs never rewrite existing view files; fold equals recomputation") {
    val root = java.nio.file.Files.createTempDirectory("graft_q194spec").toString
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/mv`"
    spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT, " +
      "first_us BIGINT, last_us BIGINT, max_value DOUBLE) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    // epoch 0 seeds the view
    val schema = StreamingBoard.q183Stage(spark, sf, root, upTo = 1)
    StreamingBoard.q183Drain(spark, root, tbl, schema)
    def fileStates(): Map[String, (Long, Long)] =
      new java.io.File(s"$root/mv").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val seed = fileStates()
    assert(seed.nonEmpty)
    // epochs 1-2: every MERGE matches most keys — under copy-on-write
    // this rewrites the matched files (q188's measured shape); under
    // merge-on-read NO pre-existing view file may change
    StreamingBoard.q183Stage(spark, sf, root, upTo = 3)
    StreamingBoard.q183Drain(spark, root, tbl, schema)
    val after = fileStates()
    seed.foreach { case (n, st) =>
      assert(after.get(n).contains(st),
        s"MOR maintenance rewrote existing view file $n")
    }
    assert(graft.sources.JsonDocVersions.dvsFor(s"$root/mv", None).nonEmpty,
      "the matched keys' old images must be delete-vectored")
    // the folded state equals the one-shot recomputation (the board row
    // proves this against DuckDB; here against Spark's own batch agg)
    val got = spark.sql(s"SELECT user_id, n_events, first_us, last_us, max_value " +
      s"FROM $tbl ORDER BY user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val want = Tables.events(spark, sf).groupBy(col("user_id")).agg(
        count(lit(1)).as("n"), min(unix_micros(col("ts").cast("timestamp"))).as("f"),
        max(unix_micros(col("ts").cast("timestamp"))).as("l"), max(col("value")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got === want, "MOR-maintained MV diverges from recomputation")
    // exactly-once bookkeeping rode the delta commits
    assert(graft.sources.JsonDocVersions.lastTxn(s"$root/mv", StreamingBoard.q183AppId)
      .exists(_ >= 2L))
    // OPTIMIZE repays the read-side debt: DVs purge, answer unchanged
    assert(graft.sources.GraftCatalog.optimize(s"$root/mv").isDefined)
    assert(graft.sources.JsonDocVersions.dvsFor(s"$root/mv", None).isEmpty)
    val got2 = spark.sql(s"SELECT user_id, n_events, first_us, last_us, max_value " +
      s"FROM $tbl ORDER BY user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got2 === want, "purge-on-compact changed the MV answer")
  }

  test("q183 replayed epoch is skipped: double-applying a batch id leaves the MV unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft_q183replay").toString
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/mv`"
    spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT, " +
      "first_us BIGINT, last_us BIGINT, max_value DOUBLE) USING `graft-jsondoc`")
    val tablePath = s"$root/mv"
    import spark.implicits._
    val batch = Seq((1L, "2024-01-01 00:00:00.000001", 2.5),
        (1L, "2024-01-01 01:00:00", 7.25), (2L, "2024-01-02 12:00:00", -3.0))
      .toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp_ntz").as("ts"), col("value"))
    StreamingBoard.q183Apply(tbl, tablePath, 0L, batch)
    val once = spark.sql(s"SELECT * FROM $tbl ORDER BY user_id").collect().toSeq
    // the epoch id must be IN the manifest the MERGE committed — the
    // atomic-ledger claim itself, not just its observable consequence
    assert(graft.sources.JsonDocVersions.lastTxn(tablePath, StreamingBoard.q183AppId)
      .contains(0L), "the MERGE's manifest commit did not record the applied epoch")
    assert(!graft.sources.GraftTxn.isPending(tablePath),
      "the commit must CONSUME the pending transaction entry")
    // the crash-replay shape: same epoch id, same data, applied again.
    // Under the r12 marker design this was only safe if the marker write
    // (AFTER the merge) had happened; with the ledger inside the table
    // commit there is no state in which the fold landed unrecorded.
    StreamingBoard.q183Apply(tbl, tablePath, 0L, batch)
    val twice = spark.sql(s"SELECT * FROM $tbl ORDER BY user_id").collect().toSeq
    assert(once == twice, "replayed epoch was folded twice — the ledger guard failed")
    assert(once.map(_.getLong(1)).sum == 3L, "first apply must have folded all rows")
    // a NEW epoch with the same content must fold (the guard is per-id)
    StreamingBoard.q183Apply(tbl, tablePath, 1L, batch)
    val next = spark.sql(s"SELECT * FROM $tbl ORDER BY user_id").collect().toSeq
    assert(next.map(_.getLong(1)).sum == 6L, "a fresh epoch id must be applied")
  }

  test("q183 a failed MERGE records no transaction and leaves the epoch re-appliable") {
    val root = java.nio.file.Files.createTempDirectory("graft_q183fail").toString
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/mv`"
    spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT, " +
      "first_us BIGINT, last_us BIGINT, max_value DOUBLE) USING `graft-jsondoc`")
    val tablePath = s"$root/mv"
    import spark.implicits._
    val bad = Seq((1L, "not-a-timestamp", 1.0)).toDF("user_id", "s", "value")
      // a column the MERGE references but the batch lacks → analysis error
      .select(col("user_id"), col("s").as("wrong_name"), col("value"))
    intercept[Exception] {
      StreamingBoard.q183Apply(tbl, tablePath, 0L, bad)
    }
    // failure path: nothing recorded, nothing pending, table untouched
    assert(graft.sources.JsonDocVersions.lastTxn(tablePath, StreamingBoard.q183AppId).isEmpty,
      "a failed MERGE must not record its epoch")
    assert(!graft.sources.GraftTxn.isPending(tablePath),
      "a failed MERGE must clear its pending transaction entry")
    // the epoch now applies cleanly — the crash shape 'MERGE died before
    // its commit' re-delivers and the fold happens exactly once
    val good = Seq((1L, "2024-01-01 00:00:00", 1.0)).toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp_ntz").as("ts"), col("value"))
    StreamingBoard.q183Apply(tbl, tablePath, 0L, good)
    assert(spark.sql(s"SELECT sum(n_events) FROM $tbl").head.getLong(0) == 1L)
    assert(graft.sources.JsonDocVersions.lastTxn(tablePath, StreamingBoard.q183AppId)
      .contains(0L))
  }

  test("q183 restart: a late file folds into the existing MV without reprocessing consumed epochs") {
    val root = java.nio.file.Files.createTempDirectory("graft_q183restart").toString
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/mv`"
    spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT, " +
      "first_us BIGINT, last_us BIGINT, max_value DOUBLE) USING `graft-jsondoc`")
    // leg 1: two of the three files
    val schema = StreamingBoard.q183Stage(spark, sf, root, upTo = 2)
    StreamingBoard.q183Drain(spark, root, tbl, schema)
    val partial = spark.sql(s"SELECT sum(n_events) FROM $tbl").head.getLong(0)
    val epochsAtStop = nBatches(root)
    // leg 2: the third file lands; the SAME checkpoint + ledger resume
    StreamingBoard.q183Stage(spark, sf, root, upTo = 3)
    StreamingBoard.q183Drain(spark, root, tbl, schema)
    assert(nBatches(root) > epochsAtStop, "restart must process the new file")
    val got = spark.sql(s"SELECT user_id, n_events, first_us, last_us, max_value " +
        s"FROM $tbl ORDER BY user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val want = Tables.events(spark, sf).groupBy(col("user_id")).agg(
        count(lit(1)).as("n"), min(unix_micros(col("ts").cast("timestamp"))).as("f"),
        max(unix_micros(col("ts").cast("timestamp"))).as("l"), max(col("value")).as("m"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got === want, "restarted MV diverges from recomputation")
    assert(got.map(_._2).sum > partial,
      "the third file contributed nothing — the restart leg went untested")
  }

  test("q150 closes every session via timers (4 delivered files) and keeps micro precision") {
    val root = java.nio.file.Files.createTempDirectory("graft_q150spec").toString
    val got = StreamingBoard.q150Impl(spark, sf, root).collect()
    assert(nBatches(root) >= 4, "two data + two sentinel batches expected")
    assert(got.nonEmpty)
    // micros survive the state round-trip: the events table has
    // sub-millisecond timestamps, so some session bound must carry a
    // non-zero micro remainder (the q150 oracle failed on exactly this)
    val micros = got.map(_.getAs[java.time.LocalDateTime]("start").getNano / 1000 % 1000)
    assert(micros.exists(_ != 0), "all session starts ms-aligned — micros truncated again?")
    // every event lands in exactly one session
    val nEvents = got.map(_.getAs[Long]("n_events")).sum
    val expected = Tables.events(spark, sf).count()
    assert(nEvents == expected, s"$nEvents session events vs $expected input events")
  }
}
