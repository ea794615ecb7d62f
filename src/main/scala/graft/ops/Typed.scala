package graft.ops

import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Typed row for the lineitem table (SURVEY.md §1.3: `Dataset[T]` with
  * case-class encoders where type safety helps). `l_shipdate` is
  * TIMESTAMP_NTZ → LocalDateTime. */
case class LineitemRow(
    l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
    l_quantity: Double, l_extendedprice: Double, l_discount: Double,
    l_tax: Double, l_returnflag: String, l_linestatus: String,
    l_shipdate: LocalDateTime)

/** Typed Dataset API surface: compile-time-checked filters and key
  * functions over case-class rows, ending in an untyped agg so the result
  * is oracle-comparable. The typed lambda filter is opaque to Catalyst
  * (no pushdown through closures — the declarative twin q01 shows the
  * pushed plan); this query exists to pin Encoder round-tripping and the
  * typed API, not to be the scan-scale path. */
object Typed {

  def q59TypedDataset(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, dir).as[LineitemRow]
      .filter(r => r.l_quantity < 10.0 && r.l_discount > 0.02)
      .groupByKey(r => (r.l_returnflag, r.l_linestatus))
      .agg(
        count(lit(1)).as("n").as[Long],
        round(sum(col("l_extendedprice")), 2).as("sum_price").as[Double])
      .toDF("key", "n", "sum_price")
      .select(col("key._1").as("l_returnflag"), col("key._2").as("l_linestatus"),
        col("n"), col("sum_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q59Sql: String =
    "SELECT l_returnflag, l_linestatus, count(*) AS n, " +
      "round(sum(l_extendedprice), 2) AS sum_price FROM lineitem " +
      "WHERE l_quantity < 10.0 AND l_discount > 0.02 " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  /** Native session_window in BATCH mode (the streaming twin is
    * Streaming.sessionStats): 30-minute-gap sessions as a single grouped
    * aggregation — Spark merges overlapping [ts, ts+gap) intervals
    * per key. The DuckDB mirror derives the same sessions with the
    * lag/cumsum recipe and reconstructs end = max(ts) + gap. */
  def q60SessionWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("w.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  val q60Sql: String =
    "WITH g AS (SELECT user_id, ts, value, CASE WHEN lag(epoch_us(ts)) OVER w IS NULL " +
      "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
      "s AS (SELECT user_id, ts, value, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM g) " +
      "SELECT user_id, min(ts) AS session_start, max(ts) + INTERVAL 30 MINUTE AS session_end, " +
      "count(*) AS n_events, round(sum(value), 2) AS session_value " +
      "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_typed_dataset" -> q59TypedDataset _,
    "q60_session_window" -> q60SessionWindow _)

  val oracle: Map[String, String] = Map(
    "q59_typed_dataset" -> q59Sql,
    "q60_session_window" -> q60Sql)
}
