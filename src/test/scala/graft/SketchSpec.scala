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
}
