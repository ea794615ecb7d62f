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
  /** events.ts has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (no native Spark type — read as
    * long via the legacy conf and divided down to micros, losslessly: the
    * driver data is micro-aligned) and plain TIMESTAMP micros (read
    * natively). Normalize BOTH to TIMESTAMP_NTZ, matching what Spark
    * infers for the other tables' naive timestamps (so no UTC-adjust skew
    * vs the DuckDB oracle, which always sees a naive timestamp). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // set-if-absent: mutating a shared session's conf on every call would
    // be surprising; one idempotent write per session is the least we can
    // do while the legacy nanos switch is session-scoped (not a reader
    // option in Spark 4). Harmless when the column is already micros.
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    raw.schema("ts").dataType match {
      case LongType => // legacy nanos generation
        raw.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => raw
      case _ => // TIMESTAMP_LTZ (isAdjustedToUTC=true): strip the zone —
        // all graft sessions run spark.sql.session.timeZone=UTC, so the
        // cast's wall-clock equals what DuckDB reads natively
        raw.withColumn("ts", expr("cast(ts as timestamp_ntz)"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Register every table as a temp view named after itself, so SQL-dialect
    * operators (GROUPING SETS, etc.) can run via `spark.sql`. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
