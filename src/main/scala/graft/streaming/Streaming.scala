package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.sql.Timestamp

/** Typed event row for streaming ops (mirrors the events table). */
case class Ev(event_id: Long, user_id: Long, event_type: String, ts: Timestamp, value: Double)

/** A closed user session emitted by the stateful sessionizer. */
case class SessionOut(user_id: Long, n_events: Long, start: Timestamp, end: Timestamp, sum_value: Double)

/** Live (open) session state: event count, start/end in epoch micros,
  * running value sum. Public because the warm-start API
  * ([[StateV2.sessionizeTwsWarmStart]]) takes a user-supplied snapshot
  * of these. */
case class SessionState(n: Long, start: Long, end: Long, sum: Double)

/** A daily grid row from the stateful gap-filler — the streaming twin of
  * `TimeSeries.q118GapFill`'s output. */
case class GapFillOut(user_id: Long, day: Timestamp, value: Double, is_observed: Int)

/** Input/output rows of the streaming per-source quota cap. */
case class QuotaDoc(doc_id: Long, source: String)
case class QuotaOut(doc_id: Long, source: String, rk: Long)

/** Streaming anomaly flagging: per-type running moments + a flagged event. */
private case class MomentState(n: Long, sum: Double, sumSq: Double)
case class AnomalyOut(event_id: Long, event_type: String, value: Double, z_score: Double)

private case class GapFillState(openDayMs: Long, openSum: Double, closed: Boolean)

/** Structured Streaming operator surface (SURVEY.md §2B streaming row).
  *
  * Every transform below is `DataFrame → DataFrame` so the identical logic
  * runs over `readStream` (incremental, stateful) and `read` (batch) —
  * StreamingSpec's parity cases assert the two agree on the events table,
  * which is the property that matters when the same pipeline must serve
  * both a backfill over 100 TB of parquet and a live micro-batch feed.
  *
  * Scale notes: all stateful ops key their state by the shuffle key
  * (window/user_id), so state is partition-local and scales with keys, not
  * events; watermarks bound state size by evicting closed windows.
  */
object Streaming {

  /** Tumbling-window counts with a watermark: late rows beyond 1 hour are
    * dropped and closed windows are evicted from the state store. */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (1h length, 30m slide): each row lands in 2 windows. */
  def slidingStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))

  /** Native session windows: 30-minute inactivity gap per user. */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming exact dedup on event_id bounded by the watermark — state
    * holds only ids younger than the watermark (the scalable form of
    * `dropDuplicates` on an unbounded stream). */
  def dedupedWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** STREAM–STREAM equi + time-range join, board-materializable form —
    * the DuckDB-checkable twin of [[viewClickJoin]] (which pins the
    * semantics on MemoryStream in StreamingSpec but never reaches the
    * driver board). Differences that matter: the two sides are
    * INDEPENDENT streaming sources (not substreams of one input), the
    * output is projected to a stable oracle-friendly shape, and the
    * range/delay are explicit so the q171 oracle can state the outer
    * emission gate numerically. BOTH sides are unbounded, so Spark
    * plans a StreamingSymmetricHashJoin that buffers each side's rows
    * in a keyed state store and probes the opposite store as rows
    * arrive.
    * What makes that viable at 100 TB/day is the TIME-RANGE predicate:
    * `error_ts ∈ [click_ts, click_ts + range]` plus a watermark on both
    * event-time columns lets Spark derive a state-eviction bound per
    * side (a buffered click can be dropped once the global watermark
    * passes `click_ts + range` — no future error can reach back to it),
    * so state is O(rows within the range horizon), not O(stream).
    * Without the range condition the buffers grow forever — which is
    * why this builder bakes the range in rather than taking a free-form
    * predicate.
    *
    * Join type:
    *  - `inner`: emits each matching (click, error) pair exactly once,
    *    in whichever micro-batch completes the pair — output set equals
    *    the batch join regardless of how rows split across batches
    *    (watermark eviction only ever drops rows whose matches have all
    *    already been emitted, provided delivery is watermark-respecting;
    *    late data beyond the 30-minute delay is dropped, same as every
    *    watermarked op).
    *  - `left_outer`: matched pairs as above; an UNMATCHED click emits
    *    its null-padded row only when the watermark proves no match can
    *    still arrive (global watermark > click_ts + range). Clicks whose
    *    horizon is still open when the stream pauses stay buffered —
    *    the price of correct null semantics on unbounded input; q171
    *    states that emission gate in its oracle instead of pretending
    *    the batch left join is reachable online.
    *  - `full_outer`: both gates at once, and they are ASYMMETRIC
    *    because the range is one-sided: a click waits out its whole
    *    forward horizon (null row once watermark > click_ts + range),
    *    but an error's potential matches all have click_ts <= error_ts,
    *    so its null row emits as soon as the watermark passes error_ts
    *    itself — the error side's state is cheaper by exactly the range
    *    width. q172 states both gates numerically in its oracle.
    *  - `left_semi`: each click emits AT MOST ONCE, when its first
    *    match arrives — existence, not pairs, so no gate is needed in
    *    the oracle (the batch semi join is reached exactly) and the
    *    click can leave state the moment it matches. Output is the
    *    click side only.
    *
    * Inputs carry (user_id, event_id, ts); sides are renamed before the
    * join because both watermark columns survive into the condition. */
  def clickErrorJoin(clicks: DataFrame, errors: DataFrame,
      joinType: String = "inner", rangeMinutes: Int = 60,
      delayMinutes: Int = 30): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_uid"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", s"$delayMinutes minutes")
    val e = errors
      .select(col("user_id").as("e_uid"), col("event_id").as("error_id"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", s"$delayMinutes minutes")
    val joined = c.join(e,
      col("c_uid") === col("e_uid") &&
        col("error_ts") >= col("click_ts") &&
        col("error_ts") <= col("click_ts") + expr(s"interval $rangeMinutes minutes"),
      joinType)
    if (joinType == "left_semi")
      joined.select(col("c_uid").as("user_id"), col("click_id"), col("click_ts"))
    else joined
      // coalesce: under full_outer an unmatched-error row has no c_uid
      // (no-op for inner/left, where c_uid is never null)
      .select(coalesce(col("c_uid"), col("e_uid")).as("user_id"),
        col("click_id"), col("error_id"), col("click_ts"), col("error_ts"))
  }

  /** Streaming exact CONTENT dedup — where the streaming surface meets
    * the dedup chain: the q29 canonical content fingerprint (not an
    * event id) keys a watermark-bounded dedup over an APPENDING document
    * corpus, so each distinct document text is emitted exactly once as
    * it first lands. Expects (doc_id, text, ingest_ts) rows; emits the
    * first-arriving row per fingerprint with its `fp` attached (the
    * same fp the batch pass groups on, so a backfilled batch q29 over
    * the accumulated corpus agrees with what the stream let through —
    * StreamingSpec pins that parity). State holds one 16-hex-char
    * fingerprint per distinct recent document, never the text, and the
    * watermark evicts fingerprints older than the horizon — the only
    * state shape that survives an unbounded corpus. */
  def dedupedDocsByFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.text.TextAnalysis.fingerprintColumn)
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")

  /** Custom stateful sessionization via flatMapGroupsWithState: emits a
    * SessionOut every time a 30-minute gap closes a session (the
    * hand-rolled twin of `session_window`, for when per-session logic
    * doesn't fit an agg — SURVEY.md §2B "custom state"). Event-time
    * ordering within a micro-batch is handled by sorting the group's
    * batch; cross-batch order relies on the watermark having dropped
    * older-than-gap arrivals. */
  /** Timestamp ↔ epoch-micros, lossless: `Timestamp.getTime` alone is
    * MILLIS and silently truncates the parquet micros (caught by q150's
    * oracle — session bounds came back 575 µs short). */
  private[streaming] def microsOf(t: Timestamp): Long =
    java.lang.Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private[streaming] def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(java.lang.Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((java.lang.Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionizeStateful(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[SessionState]) =>
          val evs = batch.toSeq.sortBy(e => (microsOf(e.ts), e.event_id))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          if (evs.isEmpty) {
            if (state.hasTimedOut && cur.isDefined) {
              val s = cur.get
              closed += SessionOut(uid, s.n, tsOfMicros(s.start), tsOfMicros(s.end), s.sum)
              state.remove()
            }
          } else {
            evs.foreach { e =>
              val t = microsOf(e.ts)
              cur match {
                case Some(s) if t - s.end <= gapUs =>
                  cur = Some(SessionState(s.n + 1, s.start, math.max(s.end, t), s.sum + e.value))
                case Some(s) =>
                  closed += SessionOut(uid, s.n, tsOfMicros(s.start), tsOfMicros(s.end), s.sum)
                  cur = Some(SessionState(1, t, t, e.value))
                case None =>
                  cur = Some(SessionState(1, t, t, e.value))
              }
            }
            val s = cur.get
            state.update(s)
            // time out once the watermark passes session end + gap
            // (the state clock is micros; the engine's timers are ms)
            state.setTimeoutTimestamp((s.end + gapUs) / 1000L)
          }
          closed.iterator
      }
  }

  /** Stateful gap fill + LOCF — q118's streaming twin: per user, daily
    * value sums with every silent day emitted as a filled row
    * (`is_observed = 0`) carrying the last closed day's sum. A day
    * closes when a later day's first event arrives for that user (the
    * observed row and the gap rows up to the new day emit together), or
    * when the event-time watermark passes the open day's end (timeout —
    * the day closes with no successor, so once the watermark sweeps
    * past the stream's tail the emitted set equals batch q118's grid
    * exactly; StreamingSpec replays the events table and asserts set
    * equality). After a timeout the state is KEPT (marked closed) so a
    * much later event still fills the intervening gap days from the
    * last closed sum. Late events for already-closed days are dropped —
    * the watermark contract, same as every watermarked aggregate here.
    *
    * Scale: state is one small record per ACTIVE user (not per day —
    * gaps materialize only at emission), keyed by the shuffle key. */
  def gapFillStateful(events: Dataset[Ev]): Dataset[GapFillOut] = {
    import events.sparkSession.implicits._
    val dayMs = 86400000L
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapFillState, GapFillOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[GapFillState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[GapFillOut]
          var cur = state.getOption
          val evs = batch.toSeq.sortBy(e => (microsOf(e.ts), e.event_id))
          if (evs.isEmpty) {
            cur match {
              case Some(s) if state.hasTimedOut && !s.closed =>
                out += GapFillOut(uid, new Timestamp(s.openDayMs), round6(s.openSum), 1)
                state.update(s.copy(closed = true))
              case _ => ()
            }
          } else {
            evs.foreach { e =>
              val d = { val t = e.ts.getTime; t - java.lang.Math.floorMod(t, dayMs) }
              cur match {
                case None =>
                  cur = Some(GapFillState(d, e.value, closed = false))
                case Some(s) if d == s.openDayMs =>
                  // closed ⇒ the watermark already sealed this day: late, drop
                  if (!s.closed) cur = Some(s.copy(openSum = s.openSum + e.value))
                case Some(s) if d > s.openDayMs =>
                  if (!s.closed)
                    out += GapFillOut(uid, new Timestamp(s.openDayMs), round6(s.openSum), 1)
                  val fill = round6(s.openSum)
                  var g = s.openDayMs + dayMs
                  while (g < d) {
                    out += GapFillOut(uid, new Timestamp(g), fill, 0)
                    g += dayMs
                  }
                  cur = Some(GapFillState(d, e.value, closed = false))
                case Some(_) => () // before the open day: late, drop
              }
            }
            val s = cur.get
            state.update(s)
            state.setTimeoutTimestamp(s.openDayMs + dayMs)
          }
          out.iterator
      }
  }

  /** Streaming per-source quota cap — q100's streaming twin (admission
    * control on an unbounded document stream: at most `cap` docs ever
    * admitted per source). Batch q100 can pick the best N by
    * content-hash priority because it sees the whole corpus; a stream
    * cannot, so the streaming semantics is FIRST-N in arrival order —
    * the honest online form (what an ingest gate actually does), with
    * the admitted rank carried so downstream can tell a source's 1st
    * doc from its 10th. State is ONE long per source (the admitted
    * count), keyed by the shuffle key, never per-doc: a source that
    * reaches its cap costs 8 bytes forever, and groups whose state
    * already hit the cap drop their docs without emitting. Within a
    * micro-batch, arrival order is made deterministic by sorting the
    * group's batch on doc_id (the sessionizeStateful policy);
    * StreamingSpec replays the documents table in doc_id order and
    * asserts equality with the batch first-N-by-doc_id window. */
  def quotaCapStateful(docs: Dataset[QuotaDoc], cap: Long = 10L): Dataset[QuotaOut] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, QuotaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[QuotaDoc], state: GroupState[Long]) =>
          var admitted = state.getOption.getOrElse(0L)
          val out = scala.collection.mutable.ArrayBuffer.empty[QuotaOut]
          batch.toSeq.sortBy(_.doc_id).foreach { d =>
            if (admitted < cap) {
              admitted += 1
              out += QuotaOut(d.doc_id, source, admitted)
            }
          }
          state.update(admitted)
          out.iterator
      }
  }

  /** Streaming anomaly flagging — q102's streaming twin (online data-QC
    * on an unbounded event feed: flag values > 3σ from their type's
    * mean AS THEY ARRIVE). Batch q102 can use whole-corpus statistics;
    * a stream cannot, so the streaming semantics is the honest online
    * one: per micro-batch, FIRST fold the batch's values into the
    * type's running (n, Σx, Σx²) moment state, THEN flag the batch's
    * events against the updated all-seen-so-far statistics — so a
    * replay that delivers everything in ONE batch flags exactly the
    * batch q102 set (the StreamingSpec parity case), while incremental
    * delivery flags against prefix statistics (what an online monitor
    * actually knows; early anomalies surface only once enough mass has
    * arrived to define "normal", i.e. n >= 30 and sd > 0). State is
    * THREE doubles + a count per event type, forever. Welford-free
    * two-pass moments are fine here: Σx² of ~1e2-magnitude values is
    * far from double overflow/cancellation at any realistic n. */
  def anomaliesStateful(events: Dataset[Ev], minN: Long = 30L): Dataset[AnomalyOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[MomentState, AnomalyOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, batch: Iterator[Ev], state: GroupState[MomentState]) =>
          // Full-microsecond order — getTime alone is millis-truncated and
          // can reorder same-millisecond events vs the oracle's fold replay.
          val evs = batch.toSeq.sortBy(e => (microsOf(e.ts), e.event_id))
          val prior = state.getOption.getOrElse(MomentState(0L, 0.0, 0.0))
          val s = evs.foldLeft(prior) { (acc, e) =>
            MomentState(acc.n + 1, acc.sum + e.value, acc.sumSq + e.value * e.value)
          }
          state.update(s)
          if (s.n < minN) Iterator.empty
          else {
            val mu = s.sum / s.n
            val variance = (s.sumSq - s.n * mu * mu) / (s.n - 1)
            if (variance <= 0.0) Iterator.empty
            else {
              val sd = math.sqrt(variance)
              evs.iterator
                .map(e => (e, (e.value - mu) / sd))
                .filter { case (_, z) => math.abs(z) > 3.0 }
                .map { case (e, z) =>
                  AnomalyOut(e.event_id, etype, e.value,
                    BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
                }
            }
          }
      }
  }

  /** Stream-static enrichment join: the streaming side joins a static
    * dimension (re-read per micro-batch if the source supports it; no
    * state store involved — the static side is just a batch plan). This
    * is the standard "enrich events with reference data" shape; with a
    * small dim Spark broadcasts it into every micro-batch. */
  def enrichEvents(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), col("user_id") === col("dim_user_id"), "left")
      .drop("dim_user_id")

  /** Stream-stream interval join: each view joins the same user's clicks
    * landing within 15 minutes after it. Both sides carry watermarks and
    * the join predicate bounds event-time distance, so the state store
    * holds only rows inside the watermark+interval horizon — the property
    * that keeps an unbounded self-join feasible. `joinType` "inner" emits
    * matches as they form; "leftOuter" additionally emits unmatched views
    * (null click columns) once the watermark proves no match can arrive. */
  def viewClickJoin(events: DataFrame, joinType: String = "inner"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    views.join(clicks,
      expr("v_user = c_user AND c_ts >= v_ts AND c_ts <= v_ts + interval 15 minutes"),
      joinType)
  }

  /** Streaming incremental corpus dedup with UNBOUNDED memory: every
    * micro-batch runs one `Bloom.ingestBatch` step against the
    * persistent block-table/fp-store pair, so a document seen ANY time
    * in the corpus's history is dropped — not just within the watermark
    * horizon that bounds `dedupedDocsByFingerprint`'s state store. The
    * two are complementary regimes: watermark state for dedup-within-
    * recency at exact-once semantics, the bloom pair for
    * dedup-against-everything at ~10 bits/doc. Novel rows land under
    * `novelPath/batch=<id>`; StreamingSpec pins multi-run parity. */
  def bloomDedupIngest(docs: DataFrame, blocksPath: String,
      fpStorePath: String, novelPath: String, checkpoint: String): Unit = {
    // micro-batch ids restart at 0 per checkpoint, so batch=<id> dirs
    // from DIFFERENT queries would collide; namespace by the checkpoint
    // identity (NOT a per-call nonce: a checkpoint-restart replays the
    // same batchId, and the replay must land in the SAME marker-gated
    // dir for the ingest's replayedStep protocol to engage)
    val run = runIdFor(docs.sparkSession, checkpoint)
    runAvailableNow(docs, (batch, id) =>
      graft.dedup.Bloom.ingestBatch(batch.sparkSession, batch, id,
        blocksPath, fpStorePath, s"$novelPath/run=$run"), checkpoint)
  }

  /** Streaming incremental NEAR-dup dedup — `Dedup.lshIngestBatch` per
    * micro-batch against the persistent signature/band stores: each
    * arriving document is checked for near-duplicates (MinHash-estimate
    * Jaccard) against everything EVER ingested, at per-batch cost
    * O(|batch| + bucket collisions). The near-dup complement of
    * `bloomDedupIngest` (exact canonical copies); together they are the
    * full q78 dedup chain running incrementally on a live feed. */
  def lshDedupIngest(docs: DataFrame, sigStorePath: String,
      bandStorePath: String, novelPath: String, checkpoint: String): Unit = {
    val run = runIdFor(docs.sparkSession, checkpoint)
    runAvailableNow(docs, (batch, id) =>
      graft.dedup.Dedup.lshIngestBatch(batch.sparkSession, batch, id,
        sigStorePath, bandStorePath, s"$novelPath/run=$run"), checkpoint)
  }

  /** Run namespace derived from CHECKPOINT IDENTITY: persisted as
    * `<checkpoint>/graft-run-id` on first start and reused by every
    * restart of the same checkpoint. foreachBatch's at-least-once
    * contract replays a crashed batchId ONLY via a checkpoint restart —
    * a per-invocation nonce would send that replay to a fresh
    * `run=<nonce>/batch=<id>` dir where no `_GRAFT_*` markers exist,
    * re-landing the same novel rows (duplicates) and orphaning the
    * half-written partition. Uses the Hadoop FS of the checkpoint path,
    * so it works wherever the checkpoint lives (HDFS/local). Publication
    * is write-temp-then-rename — the file either exists fully written or
    * not at all, so a reader can never observe a half-written id (a
    * direct create-then-write would let a concurrent or crash-
    * interrupted first start read an EMPTY id and fork the namespace).
    * If the rename loses a race to another first start, the winner's id
    * is re-read — both queries converge on one namespace. An empty or
    * unreadable id file fails loudly rather than silently mapping every
    * run to `run=`. */
  private[graft] def runIdFor(spark: SparkSession, checkpoint: String): String = {
    val path = new org.apache.hadoop.fs.Path(checkpoint, "graft-run-id")
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def read(): String = {
      val in = fs.open(path)
      val id = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      require(id.nonEmpty, s"empty run-id marker at $path — delete it " +
        "(and the orphaned novelPath/run= partition, if any) to recover")
      id
    }
    if (fs.exists(path)) read()
    else {
      val id = java.util.UUID.randomUUID().toString.take(8)
      val tmp = new org.apache.hadoop.fs.Path(checkpoint, s"graft-run-id.tmp.$id")
      val out = fs.create(tmp, false)
      try out.write(id.getBytes("UTF-8")) finally out.close()
      // rename(dst exists) returns false instead of clobbering: someone
      // else won the race — use their id
      if (fs.rename(tmp, path)) id
      else { fs.delete(tmp, false); read() }
    }
  }

  /** Scheduled micro-batch runner (§2A-19): one-shot `AvailableNow` batch
    * of a streaming query into `foreachBatch` — the Spark equivalent of
    * the reference's scheduled Lambda invocation. Returns when the
    * available data is drained. */
  def runAvailableNow(input: DataFrame, eachBatch: (DataFrame, Long) => Unit,
      checkpoint: String): Unit = {
    val q = input.writeStream
      .foreachBatch(eachBatch)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .start()
    q.awaitTermination()
  }
}
