package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star schema (see /root/repo/TESTDATA.md).
  *
  * All readers go through `spark.read.parquet` so Catalyst performs column
  * pruning and filter pushdown into the vectorized parquet scan — at 100 TB
  * the scan is the dominant cost and every query below should show
  * `PushedFilters`/`ReadSchema` restricted to what it actually uses.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
    * for. Read it as a long (legacy conf) and convert to TIMESTAMP_NTZ
    * micros — the driver data is micro-aligned so `div 1000` is lossless,
    * and NTZ matches what Spark infers for the other tables' naive
    * timestamps (so no UTC-adjust skew vs the DuckDB oracle). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // set-if-absent: mutating a shared session's conf on every call would
    // be surprising; one idempotent write per session is the least we can
    // do while the legacy nanos switch is session-scoped (not a reader
    // option in Spark 4)
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view named after itself, so SQL-dialect
    * operators (GROUPING SETS, etc.) can run via `spark.sql`. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
