package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL sketch rollup (q91): sketch-specific bytes have no SQL
  * oracle, so this spec carries the correctness story — estimates bounded
  * against exact distinct counts at all three SFs, and the property that
  * justifies storing sketches at all: ANY rollup assembled by merging
  * stored sketches (whole range, unanticipated day subsets, arbitrary
  * regroupings) answers within the sketch's error bound of exact.
  * Exact-equality merge laws are deliberately NOT asserted: measured at
  * sf0.1, DataSketches HLL merged estimates vary ~1% with grouping and
  * merge order (coupon→dense promotion points, HIP vs composite
  * estimator) — unlike Bloom/CMS/bitmap, whose merges are cell-wise
  * exact. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  private val allSfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  test("daily and merged HLL estimates stay within sketch error of exact distincts, at all three SFs") {
    allSfDirs.foreach { d =>
      val rows = ops.Advanced.q91HllRollup(spark, d).collect()
      val (days, totals) = rows.partition(r => !r.isNullAt(0))
      assert(totals.length == 1 && days.nonEmpty)
      val exactByDay = Tables.events(spark, d)
        .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getAs[java.time.LocalDateTime]("day") -> r.getLong(1)).toMap
      // lgK=12 → rse ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5% (3σ) per day
      days.foreach { r =>
        val exact = exactByDay(r.getAs[java.time.LocalDateTime]("day"))
        val est = r.getLong(1)
        assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
          s"$d day ${r.get(0)}: est $est vs exact $exact")
      }
      val exactTotal = Tables.events(spark, d)
        .agg(countDistinct(col("user_id"))).first().getLong(0)
      val estTotal = totals.head.getLong(1)
      assert(math.abs(estTotal - exactTotal) <= math.max(1L, (exactTotal * 0.05).toLong),
        s"$d total: $estTotal vs $exactTotal")
      // event counts are exact and must reconcile
      assert(days.map(_.getLong(2)).sum == totals.head.getLong(2))
    }
  }

  test("merged estimate stays within sketch error of exact under ANY grouping, at all three SFs") {
    // Measured property of DataSketches HLL (probed at sf0.1, exact
    // distinct = 1500): the merged estimate is NOT an exact function of
    // the row set — it varies with grouping granularity AND merge order
    // (1488-1500 across by-row/by-user/by-day groupings), because a
    // union promotes exact coupon SETs to dense registers at
    // data-dependent points, streamed sketches estimate via the
    // order-dependent HIP accumulator while unions use the composite
    // estimator, and partial-aggregation merge order shifts the
    // promotion point. (The r7 form asserted merged == direct and
    // passed only because sf0.01 cardinalities stay in sparse-exact
    // mode.) The law worth pinning — and the one a sketch STORE
    // actually needs — is: whatever the grouping, the merged estimate
    // stays within the lgK=12 error bound of the exact answer. Contrast
    // Bloom/CMS/bitmap (SketchSpec/ScalePrimitives): those merges ARE
    // cell-wise exact.
    allSfDirs.foreach { d =>
      def mergedBy(key: org.apache.spark.sql.Column): Long =
        Tables.events(spark, d)
          .groupBy(key)
          .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
          .first().getLong(0)
      val exact = Tables.events(spark, d)
        .agg(countDistinct(col("user_id"))).first().getLong(0)
      val ests = Seq(
        "byDay" -> mergedBy(date_trunc("day", col("ts"))),
        "byRowHash" -> mergedBy(pmod(xxhash64(col("event_id")), lit(64))),
        "byUserHash" -> mergedBy(pmod(xxhash64(col("user_id")), lit(16))),
        "direct" -> Tables.events(spark, d)
          .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
          .first().getLong(0))
      ests.foreach { case (label, est) =>
        assert(math.abs(est - exact) <= math.max(2L, (exact * 0.05).toLong),
          s"$d $label: est $est vs exact $exact")
      }
    }
  }

  test("any day-range rollup from stored sketches answers within sketch error of exact") {
    // the reuse a sketch STORE buys: answer a rollup nobody anticipated
    // (here: first half of the date range) by merging the stored daily
    // sketches — register-identical to scanning that range's raw events
    val daily = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .cache()
    try {
      val cutoff = daily.agg(expr("percentile(CAST(day AS DOUBLE), 0.5)"))
        .first().getDouble(0)
      val fromStore = daily.where(col("day").cast("double") <= cutoff)
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
        .first().getLong(0)
      // the store answers the unanticipated range within sketch error
      // of the exact answer over that range's raw rows (exact equality
      // to a re-sketch is not a property of this sketch — see the
      // grouping-invariance test)
      val exactRange = Tables.events(spark, dir)
        .where(date_trunc("day", col("ts")).cast("double") <= cutoff)
        .agg(countDistinct(col("user_id"))).first().getLong(0)
      assert(math.abs(fromStore - exactRange) <= math.max(2L, (exactRange * 0.05).toLong),
        s"store $fromStore vs exact $exactRange")
      // and the subset really is proper (not the degenerate whole range)
      assert(daily.where(col("day").cast("double") <= cutoff).count() < daily.count())
    } finally daily.unpersist()
  }

  test("CMS estimates: one-sided (est >= exact df) within a tight additive band") {
    import sketch.CountMin
    val est = CountMin.q99CmsHeavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = dedup.Dedup.q96HeavyShingles(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(est.keySet == exact.keySet && est.size == 50)
    exact.foreach { case (s, df) =>
      val e = est(s)
      // CMS can never under-count, and at w=64Ki over ~10^5 occurrences
      // the expected additive error is ~N/w < 2 per depth row; 16 is a
      // generous determinized band for the min over 4 rows
      assert(e >= df, s"under-estimate for '$s': $e < $df")
      assert(e <= df + 16, s"over-estimate for '$s': $e vs $df")
    }
  }

  test("merging split CMS sketches equals sketching the whole stream") {
    import sketch.CountMin
    val stream = dedup.Dedup.shingles(spark, dir)
      .select(explode(col("shingles")).as("s"),
        (col("doc_id") % 2).as("half"))
    val whole = CountMin.build(stream.select(col("s"))).cache()
    try {
      val merged = CountMin.merge(
        CountMin.build(stream.where(col("half") === 0).select(col("s"))),
        CountMin.build(stream.where(col("half") === 1).select(col("s"))))
      assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    } finally whole.unpersist()
  }

  test("KLL rollup (q127): every quantile estimate lands within rank error; N laws exact") {
    // k=200 KLL has ~1.65% normalized rank error (two-sided, 99% conf);
    // merged sketches degrade slightly — 4% absolute rank tolerance
    // covers both with margin while still failing a broken sketch hard
    val tol = 0.04
    val vals = Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"), col("value"))
      .collect().map(r => (r.getAs[java.time.LocalDateTime](0), r.getDouble(1)))
    val byDay = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val all = vals.map(_._2).sorted
    def rankOf(sorted: Array[Double], v: Double): Double =
      sorted.count(_ <= v).toDouble / sorted.length
    val rows = ops.Advanced.q127KllRollup(spark, dir).collect().map(r =>
      (Option(r.getAs[java.time.LocalDateTime](0)), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.count(_._1.isEmpty) == 1, "exactly one whole-range rollup row")
    rows.foreach { case (day, n, p50, p90, p99) =>
      val sorted = day.map(byDay).getOrElse(all)
      assert(n == sorted.length, s"$day: KLL tracks N exactly, got $n for ${sorted.length}")
      for ((q, est) <- Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99)) {
        // estimates must be OBSERVED values (KLL returns retained items)
        assert(sorted.contains(est), s"$day q=$q estimate $est is not a data value")
        val r = rankOf(sorted, est)
        assert(math.abs(r - q) <= tol + 1.0 / sorted.length,
          s"$day q=$q: estimate $est has true rank $r")
      }
    }
    // merge preserves N exactly: the rollup row's N is the sum of days'
    val (days, whole) = rows.partition(_._1.isDefined)
    assert(whole.head._2 == days.map(_._2).sum)
  }
}
