package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Mergeable HLL sketch rollup (q91): sketch-specific bytes have no SQL
  * oracle, so this spec carries the correctness story — estimates bounded
  * against exact distinct counts, and the property that justifies storing
  * sketches at all: merging daily sketches equals sketching the raw
  * events directly. */
class SketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("daily and merged HLL estimates stay within sketch error of exact distincts") {
    val rows = ops.Advanced.q91HllRollup(spark, dir).collect()
    val (days, totals) = rows.partition(r => !r.isNullAt(0))
    assert(totals.length == 1 && days.nonEmpty)
    val exactByDay = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[java.time.LocalDateTime]("day") -> r.getLong(1)).toMap
    // lgK=12 → rse ≈ 1.04/sqrt(2^12) ≈ 1.6%; allow 5% (3σ) per day
    days.foreach { r =>
      val exact = exactByDay(r.getAs[java.time.LocalDateTime]("day"))
      val est = r.getLong(1)
      assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"day ${r.get(0)}: est $est vs exact $exact")
    }
    val exactTotal = Tables.events(spark, dir)
      .agg(countDistinct(col("user_id"))).first().getLong(0)
    val estTotal = totals.head.getLong(1)
    assert(math.abs(estTotal - exactTotal) <= math.max(1L, (exactTotal * 0.05).toLong),
      s"total: $estTotal vs $exactTotal")
    // event counts are exact and must reconcile
    assert(days.map(_.getLong(2)).sum == totals.head.getLong(2))
  }

  test("merging daily sketches equals sketching the raw stream (lossless union)") {
    // same lgK on both paths → identical registers → identical estimate
    val direct = Tables.events(spark, dir)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))))
      .first().getLong(0)
    val merged = Tables.events(spark, dir)
      .groupBy(date_trunc("day", col("ts")))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))))
      .first().getLong(0)
    assert(direct == merged, s"direct $direct vs merged $merged")
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
}
