package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.{Ev, SessionState, StateV2, StreamingBoard}

/** The transformWithState INITIAL-STATE handoff, proven end-to-end: a
  * batch backfill computes sessions up to a cutoff, closed sessions are
  * emitted from the batch side, each user's still-open session is handed
  * to the streaming job as initial state, and the stream continues from
  * the cutoff. The union must equal the full replay EXACTLY — including
  * sessions that straddle the cutoff (stitched across the batch/stream
  * boundary, their value sums folded in the same IEEE order the full
  * replay uses) and open sessions that never see another event (closed
  * purely by the timer `handleInitialState` registered). This is the
  * production bootstrap pattern: start a 100 TB streaming pipeline from
  * a batch snapshot without replaying history through the stream. */
class StateV2Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("statev2-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"
  private val gapUs = 30L * 60 * 1000000

  private def microsOf(t: java.sql.Timestamp): Long =
    java.lang.Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def microsOfLdt(t: java.time.LocalDateTime): Long = {
    val i = t.toInstant(java.time.ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  test("warm start: batch-closed + initial-state stream equals the full replay, straddling sessions stitched") {
    import spark.implicits._
    // full-replay reference (the q173 board row, post-projected)
    val refRoot = java.nio.file.Files.createTempDirectory("graft_wsref").toString
    val want = StreamingBoard.q173Impl(spark, sf, refRoot).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        microsOfLdt(r.getAs[java.time.LocalDateTime](2)),
        microsOfLdt(r.getAs[java.time.LocalDateTime](3)), r.getDouble(4))).toSet

    // the cutoff: NOT the plain midpoint — at small SFs no open session
    // at the midpoint need ever be extended, making the stitch claim
    // vacuous (the q170 staging lesson). Instead: among consecutive
    // same-user event pairs within the 30-minute gap, take the pair
    // nearest the event-time midpoint and cut at its FIRST event — that
    // session is open at the cutoff AND continues after it, so >=1
    // streamed session must straddle. Midpoint fallback if no such pair.
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"), col("value"))
    val mm = evs.agg(min(col("ts")), max(col("ts"))).head
    val (t0, t1) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
    val all = evs.as[Ev].collect().sortBy(e => (microsOf(e.ts), e.event_id))
    val midPointUs = microsOf(new java.sql.Timestamp(t0 + (t1 - t0) / 2))
    val midUs: Long = all.groupBy(_.user_id).values.flatMap { es =>
      es.sortBy(e => (microsOf(e.ts), e.event_id)).sliding(2).collect {
        case Array(a, b)
          if microsOf(b.ts) > microsOf(a.ts) &&
            microsOf(b.ts) - microsOf(a.ts) <= gapUs => a
      }
    }.toSeq match {
      case Seq() => midPointUs
      case firsts => microsOf(firsts.minBy(a =>
        (math.abs(microsOf(a.ts) - midPointUs), a.event_id)).ts)
    }
    val mid = new java.sql.Timestamp(java.lang.Math.floorDiv(midUs, 1000000L) * 1000L)
    mid.setNanos((java.lang.Math.floorMod(midUs, 1000000L) * 1000L).toInt)

    // BATCH LEG: driver-side replay of the session fold over pre-cutoff
    // events (the spec-independent reference idiom) → closed sessions +
    // one open SessionState per still-active user
    val pre = all.filter(e => microsOf(e.ts) <= midUs)
    val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Double)]
    val open = scala.collection.mutable.Map.empty[Long, SessionState]
    pre.groupBy(_.user_id).foreach { case (uid, es) =>
      var cur: Option[SessionState] = None
      es.sortBy(e => (microsOf(e.ts), e.event_id)).foreach { e =>
        val t = microsOf(e.ts)
        cur match {
          case Some(s) if t - s.end <= gapUs =>
            cur = Some(SessionState(s.n + 1, s.start, math.max(s.end, t), s.sum + e.value))
          case Some(s) =>
            closed += ((uid, s.n, s.start, s.end, s.sum))
            cur = Some(SessionState(1, t, t, e.value))
          case None => cur = Some(SessionState(1, t, t, e.value))
        }
      }
      cur.foreach { s =>
        // still extendable at the cutoff? hand it to the stream; else close
        if (s.end + gapUs > midUs) open(uid) = s
        else closed += ((uid, s.n, s.start, s.end, s.sum))
      }
    }
    assert(open.nonEmpty, "no open sessions at the cutoff — the handoff is vacuous")

    // STREAM LEG: post-cutoff events + the two timer-driving sentinels,
    // with the open sessions as transformWithState initial state
    val root = java.nio.file.Files.createTempDirectory("graft_wsrun").toString
    val in = s"$root/in"; new java.io.File(in).mkdirs()
    val far = t1 + 100L * 86400000L
    def sentinel(id: Long, ms: Long) =
      Seq((id, StreamingBoard.SentinelUser, "x", new java.sql.Timestamp(ms), 0.0))
        .toDF("event_id", "user_id", "event_type", "ts", "value")
    val base = System.currentTimeMillis()
    StreamingBoard.addFile(evs.filter(col("ts") > lit(mid)), in, "00-late.parquet", base - 360000)
    StreamingBoard.addFile(sentinel(9000001L, far), in, "01-sent1.parquet", base - 240000)
    StreamingBoard.addFile(sentinel(9000002L, far + 1000L), in, "02-sent2.parquet", base - 120000)
    val stream = spark.readStream.schema(evs.schema)
      .option("maxFilesPerTrigger", 1).parquet(in).as[Ev]
    val init = spark.createDataset(open.toSeq).groupByKey(_._1).mapValues(_._2)

    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StateV2.sessionizeTwsWarmStart(stream, init).writeStream
        .format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set(providerKey, prevProvider)

    val streamed = spark.read.parquet(s"$root/out")
      .filter(col("user_id") < StreamingBoard.SentinelUser).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        microsOf(r.getTimestamp(2)), microsOf(r.getTimestamp(3)), r.getDouble(4)))

    val got = closed.toSet ++ streamed.toSet
    assert(got === want, s"handoff diverges from the full replay: " +
      s"${got.diff(want).take(3)} vs ${want.diff(got).take(3)}")
    assert(closed.toSet.size + streamed.toSet.size == want.size,
      "a session was emitted by both legs — the handoff double-counted")

    // non-vacuity, both interesting classes:
    // (a) >=1 straddling session was stitched (stream emitted a session
    //     that STARTS at or before the cutoff but ends after it)
    assert(streamed.exists(s => s._3 <= midUs && s._4 > midUs),
      "no straddling session was stitched across the handoff")
    // (b) >=1 handed-over session closed with NO post-cutoff event —
    //     purely by the timer handleInitialState registered
    val postUsers = evs.filter(col("ts") > lit(mid))
      .select(col("user_id")).distinct().collect().map(_.getLong(0)).toSet
    val timerOnly = open.keySet.diff(postUsers)
    assert(timerOnly.forall(u => streamed.exists(s => s._1 == u)),
      "an initial-state session with no further events never closed — its timer was lost")
    assert(timerOnly.nonEmpty || open.keySet.exists(postUsers.contains),
      "degenerate cutoff — neither handoff class exercised")
  }
}
