package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing (SURVEY.md scale notes: "pre-partition /
  * bucket for co-located joins"): when both sides are bucketed on the join
  * key into the same bucket count, the sort-merge join reads matching
  * buckets directly — zero shuffle of either side. At 100 TB this converts
  * the dominant repeated-join cost into a one-time write-side cost. */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // plan-shape assertion below wants the final (non-adaptive) plan
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.warehouse.dir",
      Files.createTempDirectory("graft_warehouse").toFile.getAbsolutePath)
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join without any shuffle exchange") {
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, dir).write.mode("overwrite")
      .bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    val shufflesBeforeAgg = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    // the only allowed exchange is the final tiny aggregation shuffle —
    // the JOIN itself must consume bucket layout directly
    assert(shufflesBeforeAgg.size <= 1,
      s"join shuffled despite bucketing:\n${joined.queryExecution.executedPlan}")

    // and the result matches the plain (shuffled) join
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      == plain.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq)
  }

  test("salted join equals the plain join (routing changes, results don't)") {
    val plain = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .count()
    val salted = ops.SkewJoin.saltedInnerJoin(
      Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
      col("l_suppkey"), col("s_suppkey"), salt = 8).count()
    assert(salted == plain)
  }

  test("salted collect equals the single-phase collect (multiset identity), slices bounded on a hot key") {
    import spark.implicits._
    // skewed frame: key "hot" holds 900 of 1000 values
    val rows = ((0 until 900).map(i => ("hot", i.toLong, (i * 7 % 101).toLong)) ++
      (0 until 100).map(i => ("cold" + (i % 5), (900 + i).toLong, i.toLong)))
      .toDF("k", "id", "v")
    val salted = ops.SkewJoin.saltedCollect(rows, col("k"), col("id"), col("v"), salt = 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val direct = rows.groupBy(col("k"))
      .agg(sort_array(collect_list(col("v")))).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(salted == direct, "two-phase collect changed the value multiset")
    // the phase-1 slices actually spread the hot key: every (key, salt)
    // slice is far below the hot key's 900 values
    val slices = rows.select(col("k"), pmod(col("id"), lit(8)).as("s"), col("v"))
      .groupBy(col("k"), col("s")).count().collect().map(_.getLong(2))
    assert(slices.max <= 900 / 8 + 8,
      s"phase-1 slice of ${slices.max} values — salt not spreading the hot key")
  }
}
