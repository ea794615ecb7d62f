package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode,
  TimerValues, ValueState}
import java.sql.Timestamp

/** The 30-minute-gap sessionizer re-expressed on Spark 4's
  * `transformWithState` (State API v2) — same semantics as
  * [[Streaming.sessionizeStateful]], different engine surface:
  *
  *  - state is a NAMED, TYPED `ValueState[SessionState]` obtained from
  *    the processor handle (the v2 model composes several named states
  *    per key — value/list/map — where `flatMapGroupsWithState` carries
  *    exactly one);
  *  - timers are FIRST-CLASS: `registerTimer`/`deleteTimer` on the
  *    handle, many per key, with expiry delivered to a dedicated
  *    `handleExpiredTimer` callback — v1 folds its single timeout into
  *    the same function behind `state.hasTimedOut`;
  *  - the operator REQUIRES the RocksDB state-store provider, so the
  *    board row doubles as coverage of the second store engine (the
  *    rest of the matrix runs the default HDFS-backed store).
  *
  * Semantics parity is the whole point: q173's oracle is q150's SQL
  * VERBATIM (the q163/q157 same-answer precedent), so the new API +
  * new store engine are proven bit-identical to the v1 operator, ordered
  * value fold and micro precision included.
  *
  * Timer discipline: a session's close timer sits at
  * `(end + gap) / 1000` ms. When a new event extends the session, the
  * old timer is DELETED before the new one is registered (v2 timers
  * don't overwrite — a stale timer would otherwise fire early against
  * an open session). `handleExpiredTimer` double-checks the firing
  * timer against the live session's own deadline and ignores stale
  * ones, so correctness never rests on the delete alone.
  *
  * Scale: identical to the v1 sessionizer — one small state record +
  * one registered timer per ACTIVE user, keyed by the shuffle key;
  * RocksDB moves the per-key store off-heap, which is the 100 TB
  * answer to state exceeding executor heap (changelog checkpointing
  * and snapshot upload amortize across micro-batches).
  */
private[streaming] trait SessionCoreV2 { this: StatefulProcessor[Long, Ev, SessionOut] =>
  import Streaming.{microsOf, tsOfMicros}
  private val gapUs = 30L * 60 * 1000000

  @transient protected var session: ValueState[SessionState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    session = getHandle.getValueState[SessionState]("session",
      Encoders.product[SessionState], TTLConfig.NONE)

  /** The close deadline of a session, in the engine's timer clock (ms). */
  protected def deadlineMs(s: SessionState): Long = (s.end + gapUs) / 1000L

  override def handleInputRows(uid: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[SessionOut] = {
    val evs = rows.toSeq.sortBy(e => (microsOf(e.ts), e.event_id))
    var cur = if (session.exists()) Some(session.get()) else None
    val prevDeadline = cur.map(deadlineMs)
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
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
    cur.foreach { s =>
      session.update(s)
      val d = deadlineMs(s)
      if (!prevDeadline.contains(d)) {
        prevDeadline.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(d)
      }
    }
    closed.iterator
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionOut] =
    if (session.exists()) {
      val s = session.get()
      // a stale timer (session since extended) fires before the live
      // deadline: ignore it, the real one is still registered
      if (info.getExpiryTimeInMs >= deadlineMs(s)) {
        session.clear()
        Iterator.single(SessionOut(uid, s.n, tsOfMicros(s.start), tsOfMicros(s.end), s.sum))
      } else Iterator.empty
    } else Iterator.empty
}

class SessionProcessorV2 extends StatefulProcessor[Long, Ev, SessionOut]
  with SessionCoreV2

/** WARM-START variant: the same sessionizer seeded from an INITIAL
  * STATE dataset — the production bootstrap pattern where a batch
  * backfill computed sessions up to a cutoff and the streaming job
  * takes over mid-session without re-reading history. Each user's open
  * session arrives as a [[SessionState]] through `handleInitialState`
  * (called once per key before any input row), which loads the state
  * AND registers its close timer — an open session that never sees
  * another event must still close by watermark, exactly as if the
  * state had been built by the stream itself. StateV2Spec proves the
  * handoff is seamless: batch-closed ∪ warm-started-streaming equals
  * the full replay, sessions straddling the cutoff stitched across the
  * batch/stream boundary. */
class SessionProcessorWarmStart
  extends StatefulProcessorWithInitialState[Long, Ev, SessionOut, SessionState]
  with SessionCoreV2 {

  override def handleInitialState(uid: Long, initial: SessionState,
      timerValues: TimerValues): Unit = {
    session.update(initial)
    getHandle.registerTimer(deadlineMs(initial))
  }
}

/** One event-type's count within a closed session — the per-session
  * histogram row [[SessionHistogramProcessor]] emits. */
case class SessionTypeCount(user_id: Long, start: Timestamp, end: Timestamp,
  event_type: String, n_events: Long)

/** COMPOSITE state on the v2 API: the sessionizer extended with a
  * per-session event-type histogram — `ValueState[SessionState]` for
  * the bounds/fold plus a named `MapState[String, Long]` for the
  * counts. This is the state shape `flatMapGroupsWithState` cannot
  * express without packing everything into one blob: v2's named states
  * live in SEPARATE state-store column families, so the hot path
  * (bounds check, gap test) never deserializes the histogram, and the
  * histogram updates touch one map entry, not the whole session record.
  * At 100 TB state that separation is the difference between O(1) and
  * O(|session vocabulary|) per event.
  *
  * Emission: when a session closes (gap exceeded in-batch, or the
  * event-time timer fires), one row PER EVENT TYPE seen in that
  * session, then the map resets for the next session. Event-time order
  * inside a batch follows the (ts, event_id) sort, so counts land in
  * the session that owns them even when a batch spans a session
  * boundary. */
class SessionHistogramProcessor
    extends StatefulProcessor[Long, Ev, SessionTypeCount] {
  import Streaming.{microsOf, tsOfMicros}
  private val gapUs = 30L * 60 * 1000000

  @transient private var session: ValueState[SessionState] = _
  @transient private var hist: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    session = getHandle.getValueState[SessionState]("session",
      Encoders.product[SessionState], TTLConfig.NONE)
    hist = getHandle.getMapState[String, Long]("hist",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  private def deadlineMs(s: SessionState): Long = (s.end + gapUs) / 1000L

  private def closeRows(uid: Long, s: SessionState): Iterator[SessionTypeCount] = {
    val rows = hist.iterator().map { case (tpe, n) =>
      SessionTypeCount(uid, tsOfMicros(s.start), tsOfMicros(s.end), tpe, n)
    }.toVector // materialize BEFORE clear invalidates the iterator
    hist.clear()
    rows.iterator
  }

  override def handleInputRows(uid: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[SessionTypeCount] = {
    val evs = rows.toSeq.sortBy(e => (microsOf(e.ts), e.event_id))
    var cur = if (session.exists()) Some(session.get()) else None
    val prevDeadline = cur.map(deadlineMs)
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionTypeCount]
    def bump(tpe: String): Unit =
      hist.updateValue(tpe, (if (hist.containsKey(tpe)) hist.getValue(tpe) else 0L) + 1L)
    evs.foreach { e =>
      val t = microsOf(e.ts)
      cur match {
        case Some(s) if t - s.end <= gapUs =>
          cur = Some(SessionState(s.n + 1, s.start, math.max(s.end, t), s.sum + e.value))
        case Some(s) =>
          out ++= closeRows(uid, s)
          cur = Some(SessionState(1, t, t, e.value))
        case None =>
          cur = Some(SessionState(1, t, t, e.value))
      }
      bump(e.event_type)
    }
    cur.foreach { s =>
      session.update(s)
      val d = deadlineMs(s)
      if (!prevDeadline.contains(d)) {
        prevDeadline.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(d)
      }
    }
    out.iterator
  }

  override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessionTypeCount] =
    if (session.exists()) {
      val s = session.get()
      if (info.getExpiryTimeInMs >= deadlineMs(s)) {
        session.clear()
        closeRows(uid, s)
      } else Iterator.empty
    } else Iterator.empty
}

/** A buffered event reference in the pattern detector's ListState. */
case class EvRef(ts: Long, event_id: Long, event_type: String)

/** A detected view→click→purchase triple. */
case class PatternHit(user_id: Long, view_id: Long, click_id: Long,
  purchase_id: Long, purchase_ts: Timestamp)

/** STREAMING PATTERN DETECTION on `ListState` — the third v2 state type
  * (q173 ValueState / q178 MapState / here a bounded recent-history
  * list): emit a hit whenever a user's three CONSECUTIVE events (event
  * time, ties by event_id) are view → click → purchase. The state is
  * the last two events per user — `ListState.put` replaces the window
  * each batch, so a user costs two small rows forever regardless of
  * stream length, and emission is immediate on the closing purchase (no
  * timers, no watermark horizon: a pattern over consecutive events is
  * decided the moment its last element arrives). Cross-batch hits work
  * because the buffer is state: view+click in one micro-batch, the
  * purchase a batch later, the triple still fires — which is exactly
  * what the q179 staging cut proves. Within a batch events fold in
  * (ts, event_id) order; across batches the file-stream delivery is
  * event-time ordered, matching the batch oracle's total order. */
class PatternProcessor extends StatefulProcessor[Long, Ev, PatternHit] {
  import Streaming.{microsOf, tsOfMicros}

  @transient private var recent: org.apache.spark.sql.streaming.ListState[EvRef] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getListState[EvRef]("recent",
      Encoders.product[EvRef], TTLConfig.NONE)

  override def handleInputRows(uid: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[PatternHit] = {
    val evs = rows.toSeq.sortBy(e => (microsOf(e.ts), e.event_id))
      .map(e => EvRef(microsOf(e.ts), e.event_id, e.event_type))
    var buf = if (recent.exists()) recent.get().toVector else Vector.empty[EvRef]
    val out = scala.collection.mutable.ArrayBuffer.empty[PatternHit]
    evs.foreach { e =>
      if (buf.length == 2 && buf(0).event_type == "view" &&
          buf(1).event_type == "click" && e.event_type == "purchase")
        out += PatternHit(uid, buf(0).event_id, buf(1).event_id,
          e.event_id, tsOfMicros(e.ts))
      buf = (buf :+ e).takeRight(2)
    }
    recent.put(buf.toArray)
    out.iterator
  }
}

object StateV2 {
  /** q150's dataflow on the v2 API: watermarked events, grouped by
    * user, sessionized by [[SessionProcessorV2]] with event-time
    * timers closing idle sessions. */
  def sessionizeTws(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorV2,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Consecutive view→click→purchase detection via [[PatternProcessor]]
    * (bounded ListState, immediate emission). */
  def patternTws(events: Dataset[Ev]): Dataset[PatternHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new PatternProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Per-session event-type histograms via composite v2 state — see
    * [[SessionHistogramProcessor]]. */
  def sessionHistogramTws(events: Dataset[Ev]): Dataset[SessionTypeCount] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionHistogramProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[sessionizeTws]] seeded from a batch-computed open-session
    * snapshot (keyed by user) — see [[SessionProcessorWarmStart]]. */
  def sessionizeTwsWarmStart(events: Dataset[Ev],
      openSessions: KeyValueGroupedDataset[Long, SessionState]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessorWarmStart,
        TimeMode.EventTime(), OutputMode.Append(), openSessions,
        implicitly[org.apache.spark.sql.Encoder[SessionOut]],
        implicitly[org.apache.spark.sql.Encoder[SessionState]])
  }
}
