package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history build (q89) and next-day retention (q90): the DuckDB
  * oracle pins exact values; this spec pins the STRUCTURAL invariants —
  * SCD2 intervals must tile each user's timeline without overlap, and
  * retention counts must be bounded by activity. */
class Scd2RetentionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("SCD2 intervals tile each user's history: versions dense, runs alternate, exactly one open row") {
    val rows = ops.TimeSeries.q89Scd2(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime]("valid_from"),
        Option(r.getAs[java.time.LocalDateTime]("valid_to"))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, h0) =>
      val h = h0.sortBy(_._2)
      // versions are 1..n dense
      assert(h.map(_._2).toSeq == (1L to h.length.toLong), s"user $user versions")
      // exactly the last interval is open; each closed interval ends
      // where the next begins (no gap, no overlap)
      assert(h.last._5.isEmpty, s"user $user open row")
      h.init.zip(h.tail).foreach { case (cur, nxt) =>
        assert(cur._5.contains(nxt._4), s"user $user v${cur._2} not contiguous")
        // a run boundary means the attribute actually changed
        assert(cur._3 != nxt._3, s"user $user v${cur._2} no change at boundary")
      }
    }
    // interval count matches an independent run-length count
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val expected = Tables.events(spark, dir)
      .withColumn("chg", when(lag(col("event_type"), 1).over(w).isNull ||
        lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L).otherwise(0L))
      .agg(sum(col("chg"))).first().getLong(0)
    assert(rows.length.toLong == expected)
  }

  test("retention is bounded, and a user active on consecutive days is counted") {
    val rows = ops.TimeSeries.q90Retention(spark, dir).collect().map(r =>
      (r.getAs[java.time.LocalDateTime]("day"), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, active, retained, rate) =>
      assert(active > 0 && retained >= 0 && retained <= active, s"$day")
      assert(rate == retained.toDouble / active, s"$day rate")
    }
    // cross-check one day against a direct computation
    val d = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val probe = rows.head
    val users = d.filter(col("day") === probe._1).select("user_id")
    val next = d.filter(col("day") === java.sql.Timestamp.valueOf(probe._1.plusDays(1)))
      .select("user_id")
    assert(users.count() == probe._2)
    assert(users.intersect(next).count() == probe._3)
  }

  test("incremental SCD2 apply equals the batch rebuild row-for-row, and closed history passes through untouched") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.time.LocalDateTime]("valid_from"),
        Option(r.getAs[java.time.LocalDateTime]("valid_to")))
    val batch = ops.TimeSeries.q89Scd2(spark, dir).collect().map(key)
    val incr = ops.TimeSeries.q113Scd2Apply(spark, dir).collect().map(key)
    // run compression is associative: splitting the event stream at the
    // cutoff and continuing from each entity's open row reproduces the
    // batch history EXACTLY (same versions, same intervals)
    assert(incr.toSeq == batch.toSeq,
      s"incremental/batch diverge: ${incr.toSet.diff(batch.toSet).take(3)} vs ${batch.toSet.diff(incr.toSet).take(3)}")
    // the incremental path re-emitted (not recomputed) every row that was
    // already closed before the cutoff: all of them appear verbatim
    val cutoff = java.time.LocalDateTime.parse("2024-01-20T00:00:00")
    val closedBefore = batch.filter(r => r._5.exists(_.isBefore(cutoff)))
    assert(closedBefore.nonEmpty)
    assert(closedBefore.forall(incr.toSet.contains))
  }

  test("gap fill (q118): complete daily grid per user, LOCF values, observed flags exact") {
    val observed = Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(round(sum(col("value")), 6).as("v")).collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Timestamp](1).toLocalDateTime, r.getDouble(2)))
      .groupBy(_._1).map { case (u, xs) =>
        u -> xs.map(x => x._2 -> x._3).toMap
      }
    val got = ops.TimeSeries.q118GapFill(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("day"),
        r.getDouble(2), r.getInt(3)))
      .groupBy(_._1)
    assert(got.keySet == observed.keySet, "one grid per active user")
    got.foreach { case (u, rows) =>
      val byDay = rows.sortBy(_._2)
      val obs = observed(u)
      // grid is exactly [min observed day, max observed day], stride 1 day
      assert(byDay.head._2 == obs.keys.min && byDay.last._2 == obs.keys.max, s"user $u bounds")
      byDay.sliding(2).foreach {
        case Array(a, b) => assert(b._2 == a._2.plusDays(1), s"user $u grid gap at ${a._2}")
        case _ => ()
      }
      // LOCF: value = last observed daily sum at or before the grid day
      var lastV = Double.NaN
      byDay.foreach { case (_, day, v, flag) =>
        obs.get(day) match {
          case Some(o) =>
            assert(flag == 1 && v == o, s"user $u observed day $day")
            lastV = o
          case None =>
            assert(flag == 0 && v == lastV, s"user $u filled day $day")
        }
      }
    }
    // non-vacuous: somebody has a gap at this SF
    assert(got.values.exists(_.exists(_._4 == 0)), "no filled gap anywhere — vacuous")
  }

  test("funnel (q120) matches a per-user driver-side replay of the ordered steps") {
    val week = java.time.Duration.ofDays(7)
    val byUser = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[java.time.LocalDateTime](2), r.getString(3)))
      .groupBy(_._1)
    // per user: first view; first click in [first view, +7d]; first
    // purchase in [that click, +7d]
    var (u1, u2, u3) = (0, 0, 0)
    byUser.foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val v = sorted.find(_._4 == "view").map(_._3)
      val c = v.flatMap(vt => sorted.find(e => e._4 == "click" &&
        !e._3.isBefore(vt) && !e._3.isAfter(vt.plus(week))).map(_._3))
      val p = c.flatMap(ct => sorted.find(e => e._4 == "purchase" &&
        !e._3.isBefore(ct) && !e._3.isAfter(ct.plus(week))).map(_._3))
      if (v.isDefined) u1 += 1
      if (c.isDefined) u2 += 1
      if (p.isDefined) u3 += 1
    }
    val got = ops.TimeSeries.q120Funnel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, "view", u1.toLong), (2L, "click", u2.toLong), (3L, "purchase", u3.toLong)))
    // funnel is monotone and the rates divide the step counts
    assert(u1 >= u2 && u2 >= u3)
    assert(math.abs(got(1)._4 - u2.toDouble / u1) < 1e-6)
    assert(math.abs(got(2)._4 - u3.toDouble / u2) < 1e-6)
    // the ordering constraint must bite: some user has all three types
    // but no qualifying ordered chain (else this is just type counting)
    val typeCounts = byUser.count { case (_, es) =>
      Set("view", "click", "purchase").subsetOf(es.map(_._4).toSet)
    }
    assert(typeCounts > u3, "every 3-type user converts — ordering never bites, vacuous")
  }

  test("concurrency peak (q141): per-day maxima match a driver-side sweep over q23's sessions") {
    val got = ops.TimeSeries.q141ConcurrencyPeak(spark, dir).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).toLocalDate, r.getLong(1), r.getLong(2)))
    val sessions = ops.TimeSeries.q23Sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime]("session_start"),
        r.getAs[java.time.LocalDateTime]("session_end")))
    // reference: one global sweep, end-exclusive (-1 before +1 at ties)
    def nanos(t: java.time.LocalDateTime): Long =
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + t.getNano
    val pts = sessions.flatMap { case (u, s, st, en) =>
      Seq((st, 1, u, s), (en, -1, u, s))
    }.sortBy { case (t, d, u, s) => (nanos(t), d, u, s) }
    var run = 0L
    val perDay = scala.collection.mutable.Map.empty[java.time.LocalDate, Long]
    val started = scala.collection.mutable.Map.empty[java.time.LocalDate, Long]
    pts.foreach { case (t, d, _, _) =>
      run += d
      val day = t.toLocalDate
      perDay(day) = math.max(perDay.getOrElse(day, Long.MinValue), run)
      if (d == 1) started(day) = started.getOrElse(day, 0L) + 1
    }
    assert(got.length == perDay.size)
    got.foreach { case (day, peak, nStarted) =>
      assert(peak == perDay(day), s"$day peak $peak vs ${perDay(day)}")
      assert(nStarted == started.getOrElse(day, 0L), s"$day started")
    }
    // sanity: the sweep ends balanced (every +1 met its -1)
    assert(run == 0L)
    // peaks are positive and bounded by sessions started that day + carry
    got.foreach { case (_, peak, _) => assert(peak >= 1L) }
  }

  test("KL drift (q121) matches a driver-side recompute and is symmetric-positive") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), col("ts")).collect()
      .map(r => (r.getString(0), math.floor(r.getDouble(1) / 50.0).toLong,
        r.getAs[java.time.LocalDateTime](2).isBefore(java.time.LocalDateTime.parse("2024-01-16T00:00"))))
    val got = ops.TimeSeries.q121KlDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val byType = rows.groupBy(_._1)
    assert(got.map(_._1) == byType.keys.toSeq.sorted)
    got.foreach { case (t, na, nb, kl) =>
      val es = byType(t)
      val buckets = es.map(_._2).distinct
      val (a, b) = es.partition(_._3)
      assert(na == a.size && nb == b.size, s"type $t half sizes")
      val ca = a.groupBy(_._2).view.mapValues(_.size).toMap
      val cb = b.groupBy(_._2).view.mapValues(_.size).toMap
      val ref = buckets.map { bk =>
        val pa = (ca.getOrElse(bk, 0) + 1).toDouble / (a.size + buckets.size)
        val pb = (cb.getOrElse(bk, 0) + 1).toDouble / (b.size + buckets.size)
        pa * math.log(pa / pb) + pb * math.log(pb / pa)
      }.sum
      assert(math.abs(kl - ref) < 1e-6, s"type $t: $kl vs $ref")
      assert(kl >= 0, s"type $t symmetric KL must be non-negative")
    }
  }

  test("MAD outliers (q123): robust stats match a driver-side recompute; flags subset-consistent") {
    def round6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else s(n / 2 - 1) + 0.5 * (s(n / 2) - s(n / 2 - 1))
    }
    val byType = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
    val got = ops.TimeSeries.q123MadOutliers(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq == byType.keys.toSeq.sorted)
    got.foreach { case (t, med, mad, n, out) =>
      val vs = byType(t).map(_._2).toSeq
      val m = round6(median(vs))
      val ad = vs.map(v => math.abs(v - m))
      val md = round6(median(ad))
      assert(med == m, s"type $t median")
      assert(mad == md, s"type $t mad")
      assert(n == vs.size)
      assert(out == ad.count(_ > 1.4826 * md * 3.0), s"type $t outlier count")
      // robustness sanity: flags are a minority and MAD is positive
      assert(out < n / 4 && md > 0)
    }
  }

  test("changepoint (q126): best mean-shift split matches an exhaustive driver-side scan") {
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        math.round(r.getDouble(2) * 100)))
    val got = ops.TimeSeries.q126Changepoint(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    val byType = rows.groupBy(_._1)
    assert(got.map(_._1).toSeq == byType.keys.toSeq.sorted)
    got.foreach { case (t, cutDay, mb, ma, shift) =>
      val daily = byType(t).groupBy(_._2).view
        .mapValues(es => (es.map(_._3).sum, es.size.toLong)).toMap
      val days = daily.keys.toSeq.sorted(Ordering.by((d: java.time.LocalDateTime) => d.toString))
      // exhaustive scan over every candidate split (all but the first day)
      val best = days.drop(1).map { d =>
        val (l, r) = days.partition(_.isBefore(d))
        def mean(ds: Seq[java.time.LocalDateTime]) = {
          val (c, n) = ds.map(daily).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
          (c.toDouble / 100.0) / n
        }
        (d, mean(l), mean(r), math.abs(mean(l) - mean(r)))
      }.maxBy { case (d, _, _, s) => (s, -days.indexOf(d)) } // max shift, earliest day wins ties
      assert(cutDay == best._1, s"type $t cut day: $cutDay vs ${best._1}")
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mb == r6(best._2) && ma == r6(best._3) && shift == r6(best._4), s"type $t stats")
      // the cut must split the series properly (not an endpoint artifact)
      assert(days.head.isBefore(cutDay) && !days.last.isBefore(cutDay))
    }
  }

  test("journey mining (q128): session-bounded trigram counts match a driver-side replay") {
    val gapUs = 1800000000L
    val byUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    byUser.values.foreach { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      // split into sessions at 30-minute gaps, then count trigrams within
      val sessions = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[String]]
      var prevUs = Long.MinValue
      sorted.foreach { e =>
        if (sessions.isEmpty || e._3 - prevUs > gapUs)
          sessions += scala.collection.mutable.ArrayBuffer(e._4)
        else sessions.last += e._4
        prevUs = e._3
      }
      sessions.foreach(s => s.sliding(3).filter(_.size == 3)
        .foreach(t => counts(t.mkString(">")) = counts.getOrElse(t.mkString(">"), 0L) + 1))
    }
    val expected = counts.toSeq.sortBy { case (j, c) => (-c, j) }.take(10)
    val got = ops.TimeSeries.q128Journeys(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(x => x._1 != x._2)}")
    // session boundaries must bite: total trigrams is less than the
    // unsessionized count (else sessionization is vacuous here)
    val unsessionized = byUser.values.map(es => math.max(0, es.size - 2)).sum
    assert(counts.values.sum < unsessionized, "no trigram was cut by a session boundary")
  }

  test("EMA smoothing (q152): recurrence laws — seed equals first value, convex hull respected") {
    val rows = ops.TimeSeries.q152EmaSmoothing(spark, dir).collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, series) =>
      val ordered = series.sortBy(_._2.toString)
      // seed: ema(day 1) = v(day 1)
      assert(ordered.head._3 == ordered.head._4, s"$t seed")
      // convexity: each ema lies between the running min and max of the
      // values seen so far (alpha in (0,1) can never overshoot), within
      // the 6-decimal reporting rounding
      var (lo, hi) = (ordered.head._3, ordered.head._3)
      ordered.foreach { case (_, _, v, ema) =>
        lo = math.min(lo, v); hi = math.max(hi, v)
        assert(ema >= lo - 1e-6 && ema <= hi + 1e-6,
          s"$t ema $ema outside running hull [$lo, $hi]")
      }
    }
  }

  test("q155: bin-bucketed interval join == naive theta join on crafted edge cases and the real corpus") {
    import spark.implicits._
    // crafted: multi-bin spans, exact-touch boundaries (closed
    // intervals: s_a == e_b IS an overlap), nesting, disjoint gaps,
    // and an interval far longer than the bin width
    val W = 100L
    val a = Seq(
      (1L, 0L, 99L),     // inside one bin
      (2L, 95L, 105L),   // straddles a bin boundary
      (3L, 0L, 1000L),   // spans 11 bins
      (4L, 300L, 300L),  // zero-length
      (5L, 500L, 520L)).toDF("a_id", "s_a", "e_a")
    val b = Seq(
      (10L, 99L, 99L),   // touches a1's end exactly
      (11L, 100L, 200L), // overlaps a2 and a3, not a1 (closed: 99 < 100)
      (12L, 250L, 350L), // covers a4, inside a3
      (13L, 2000L, 2100L)).toDF("b_id", "s_b", "e_b") // disjoint
    val got = ops.TimeSeries.intervalOverlapPairs(a, b, binUs = W)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = a.crossJoin(b)
      .where(col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == naive, s"bin join diverged from theta join: $got vs $naive")
    assert(got == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 11L), (3L, 12L), (4L, 12L)),
      s"crafted overlap set wrong: $got")
    // each pair exactly once — the greatest-start-bin trick must not
    // duplicate the 11-bin-span pairs
    assert(got.distinct == got)

    // real corpus: the board query equals its own quadratic twin
    val board = ops.TimeSeries.q155IntervalJoin(spark, dir).collect()
    assert(board.length > 0, "no session/incident overlaps at sf0.01")
    // the SAME inputs the board query uses (shared builders — one
    // tunable incident window), joined independently by brute force
    val sess = ops.TimeSeries.sessionIntervalsOf(spark, dir)
    val inc = ops.TimeSeries.incidentWindowsOf(spark, dir)
    val nNaive = sess.crossJoin(inc)
      .where(col("s_a") <= col("e_b") && col("s_b") <= col("e_a")).count()
    assert(board.length.toLong == nNaive,
      s"board bin join found ${board.length} pairs, theta join $nNaive")
  }

  test("q157: bitmap set-algebra retention equals q90's join-form row for row") {
    val fmt = (r: org.apache.spark.sql.Row) =>
      (r.getAs[java.time.LocalDateTime](0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val viaJoin = ops.TimeSeries.q90Retention(spark, dir).collect().map(fmt).toSeq
    val viaBitmap = ops.TimeSeries.q157BitmapRetention(spark, dir).collect().map(fmt).toSeq
    assert(viaBitmap == viaJoin,
      s"bitmap retention diverged from the join form: ${viaBitmap.take(3)} vs ${viaJoin.take(3)}")
    assert(viaBitmap.nonEmpty && viaBitmap.exists(_._3 > 0),
      "corpus should retain at least one user somewhere")
  }

  test("q158: incremental cube ingest is batch-order invariant and equals the one-shot cube") {
    val fmt = (r: org.apache.spark.sql.Row) =>
      (r.getAs[java.time.LocalDateTime](0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val oneShot = ops.TimeSeries.q157BitmapRetention(spark, dir).collect().map(fmt).toSeq
    val ev = graft.Tables.events(spark, dir)
    def ingested(order: Seq[Int]): Seq[(java.time.LocalDateTime, Long, Long, Double)] = {
      val store = graft.RunTag.scratchFresh("bitmap_cube_spec")
      order.foreach(b => ops.TimeSeries.bitmapCubeIngest(
        ev.where(pmod(col("event_id"), lit(3)) === b), store))
      ops.TimeSeries.bitmapCubeRetention(spark, store).collect().map(fmt).toSeq
    }
    assert(ingested(Seq(0, 1, 2)) == oneShot,
      "segment-merged cube diverged from the one-shot cube")
    // OR's commutativity makes the store order-invariant — including a
    // duplicated (replayed) segment
    assert(ingested(Seq(2, 0, 1, 0)) == oneShot,
      "reordered/replayed segments changed the cube")
  }
}
