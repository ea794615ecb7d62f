package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * standard answer to "queries filter on BOTH x and y but files can only
  * be sorted one way". Interleaving the bits of two sort keys gives a
  * single clustering key whose ranges are 2-D tiles: range-partition +
  * sort by it and every parquet file covers a NARROW slice of BOTH
  * columns, so either predicate prunes files via min/max footer stats.
  * A linear sort by x gives perfect x-pruning and ZERO y-pruning — at
  * 100 TB that's the difference between reading one tile and scanning
  * the whole table for every y-filtered query. (Public technique —
  * Morton 1966; used by every lakehouse OPTIMIZE/CLUSTER BY
  * implementation.)
  *
  * Everything is pure column arithmetic (shift/mask/or), codegen'd,
  * shuffle-free until the one range-repartition that IS the layout job.
  */
object Layout {

  /** Bit-interleave two non-negative ints confined to `bits` bits each:
    * x's bit i lands at even position 2i, y's at odd 2i+1. Inputs are
    * masked to `bits` first, so callers normalize (bucket/scale) into
    * range; 16+16 → a 32-bit Morton code in a long. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    val mask = lit((1L << bits) - 1)
    val xm = x.cast("long").bitwiseAND(mask)
    val ym = y.cast("long").bitwiseAND(mask)
    (0 until bits).map { i =>
      val xbit = shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
      val ybit = shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xbit.bitwiseOR(ybit)
    }.reduce(_.bitwiseOR(_))
  }

  /** The layout operator: cluster `df` into `n` write tasks by the
    * Z-value of (x, y). Both keys are first RANGE-NORMALIZED into the
    * full 2^bits domain — raw interleave of unequal-width ranges puts
    * all the high varying bits on the wider dimension and degenerates
    * toward a linear sort on it (no locality for the narrow one). The
    * bounds come from one cheap min/max aggregation broadcast back as a
    * 1-row join (at production scale, read them from table stats
    * instead). repartitionByRange's sampled boundaries then make each
    * output file one contiguous Z-range ≈ one 2-D tile;
    * sortWithinPartitions tightens per-row-group stats inside each file.
    * LayoutSpec measures the effect directly on written parquet. */
  def layoutZOrder(df: DataFrame, x: Column, y: Column, n: Int,
      bits: Int = 16): DataFrame = {
    val top = (1L << bits) - 1
    val bounds = df.agg(min(x).cast("long").as("_xmin"), max(x).cast("long").as("_xmax"),
      min(y).cast("long").as("_ymin"), max(y).cast("long").as("_ymax"))
    // normalize through DOUBLE: the integer form ((c-lo)*top) overflows
    // Long once the key range exceeds ~2^47 (epoch-micros over a few
    // years would silently wrap and shred the layout). Double's 53-bit
    // mantissa keeps the division exact ENOUGH for a layout key — the
    // worst rounding error moves a row one tile at a 2^53-wide domain,
    // and the layout contract is locality, not bit-exactness (q97's
    // oracle-pinned zValue is separate and stays all-integer).
    def norm(c: Column, lo: Column, hi: Column): Column =
      ((c.cast("long") - lo).cast("double") * top /
        greatest(hi - lo, lit(1L)).cast("double")).cast("long")
    val withZ = df.crossJoin(broadcast(bounds))
      .withColumn("_z", zValue(
        norm(x, col("_xmin"), col("_xmax")),
        norm(y, col("_ymin"), col("_ymax")), bits))
      .drop("_xmin", "_xmax", "_ymin", "_ymax")
    withZ.repartitionByRange(n, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** q97: the Morton codes themselves over orders — x = customer key,
    * y = order date as days since 1990-01-01 (same epoch expression as
    * q39's oracle), both masked to 16 bits. Pure integer arithmetic →
    * the DuckDB oracle replays the identical shifts and hash-matches
    * bit-for-bit, pinning the interleave the layout operator sorts by. */
  def q97ZOrder(spark: SparkSession, dir: String): DataFrame = {
    val dayNum = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        dayNum.cast("long").as("day_num"),
        zValue(col("o_custkey"), dayNum, 16).as("zval"))
      .orderBy(col("o_orderkey"))
  }

  val q97Sql: String = {
    val x = s"(o_custkey & 65535)"
    val y = s"(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) & 65535)"
    val terms = (0 until 16).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})")
    }
    "SELECT o_orderkey, o_custkey, " +
      "date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_num, " +
      s"(${terms.mkString(" | ")}) AS zval " +
      "FROM orders ORDER BY o_orderkey"
  }

  /** Hilbert index of a non-negative (x, y) point masked to `bits` bits
    * per dimension — the space-filling curve with STRICTLY better
    * locality than Morton: consecutive Hilbert indices are always grid
    * neighbors (unit steps — LayoutSpec proves it exhaustively), while
    * the Z curve takes a long diagonal jump at every power-of-two
    * boundary. At 100 TB that shows up as tighter per-file min/max
    * envelopes for the SAME file count, i.e. strictly more pruning.
    *
    * The standard xy2d walk (public algorithm — Hilbert 1891; the
    * bit-level formulation every lakehouse/geo index uses) folds state
    * (x, y, d) through the bit levels with a CONDITIONAL ROTATION — so
    * unlike [[zValue]] it cannot be unrolled into flat column
    * arithmetic (each level's x/y feed the next through CASE branches:
    * inlined, the expression tree grows ~4× per level and 4^16 kills
    * the optimizer). It runs as a Catalyst `aggregate` higher-order
    * fold instead (the q152 recurrence idiom — linear-size plan, zero
    * UDFs); the DuckDB oracle replays the identical walk with the 16
    * levels unrolled as chained CTE stages. */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column = {
    val mask = lit((1L << bits) - 1)
    val levels = (0 until bits).reverse.map(i => 1L << i)
    aggregate(
      typedLit(levels),
      struct(x.cast("long").bitwiseAND(mask).as("x"),
        y.cast("long").bitwiseAND(mask).as("y"), lit(0L).as("d")),
      (acc, s) => {
        val (ax, ay, ad) = (acc.getField("x"), acc.getField("y"), acc.getField("d"))
        val rx = when(ax.bitwiseAND(s) =!= 0, lit(1L)).otherwise(lit(0L))
        val ry = when(ay.bitwiseAND(s) =!= 0, lit(1L)).otherwise(lit(0L))
        val nd = ad + s * s * (lit(3L) * rx).bitwiseXOR(ry)
        val nx = when(ry === 0, when(rx === 1, s - 1 - ay).otherwise(ay)).otherwise(ax)
        val ny = when(ry === 0, when(rx === 1, s - 1 - ax).otherwise(ax)).otherwise(ay)
        struct(nx.as("x"), ny.as("y"), nd.as("d"))
      },
      acc => acc.getField("d"))
  }

  /** The Hilbert twin of [[layoutZOrder]] — same range normalization,
    * same one range-repartition, only the clustering key changes. */
  def layoutHilbert(df: DataFrame, x: Column, y: Column, n: Int,
      bits: Int = 16): DataFrame = {
    val top = (1L << bits) - 1
    val bounds = df.agg(min(x).cast("long").as("_xmin"), max(x).cast("long").as("_xmax"),
      min(y).cast("long").as("_ymin"), max(y).cast("long").as("_ymax"))
    def norm(c: Column, lo: Column, hi: Column): Column =
      ((c.cast("long") - lo).cast("double") * top /
        greatest(hi - lo, lit(1L)).cast("double")).cast("long")
    df.crossJoin(broadcast(bounds))
      .withColumn("_h", hilbertValue(
        norm(x, col("_xmin"), col("_xmax")),
        norm(y, col("_ymin"), col("_ymax")), bits))
      .drop("_xmin", "_xmax", "_ymin", "_ymax")
      .repartitionByRange(n, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }

  /** q160: the Hilbert indices over orders — q97's twin with the better
    * curve, same keys (customer × order-day), hash-checked against the
    * unrolled-CTE walk. */
  def q160HilbertOrder(spark: SparkSession, dir: String): DataFrame = {
    val dayNum = datediff(col("o_orderdate"), lit("1990-01-01").cast("date"))
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        dayNum.cast("long").as("day_num"),
        hilbertValue(col("o_custkey"), dayNum, 16).as("hval"))
      .orderBy(col("o_orderkey"))
  }

  val q160Sql: String = {
    val init = "h16 AS (SELECT o_orderkey, o_custkey, " +
      "date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day_num, " +
      "CAST(o_custkey & 65535 AS BIGINT) AS hx, " +
      "CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) & 65535 AS BIGINT) AS hy, " +
      "CAST(0 AS BIGINT) AS hd FROM orders)"
    val stages = (15 to 0 by -1).map { i =>
      val s = 1L << i
      s"h$i AS (SELECT o_orderkey, o_custkey, day_num, " +
        s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - hy ELSE hy END) ELSE hx END AS hx, " +
        s"CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${s - 1} - hx ELSE hx END) ELSE hy END AS hy, " +
        s"hd + ${s * s} * xor(3 * rx, ry) AS hd FROM (" +
        s"SELECT *, CASE WHEN hx & $s != 0 THEN 1 ELSE 0 END AS rx, " +
        s"CASE WHEN hy & $s != 0 THEN 1 ELSE 0 END AS ry FROM h${i + 1}))"
    }
    s"WITH $init, ${stages.mkString(", ")} " +
      "SELECT o_orderkey, o_custkey, day_num, hd AS hval FROM h0 ORDER BY o_orderkey"
  }

  /** Small-file compaction — the other half of layout governance (a
    * streaming/incremental writer leaves thousands of KB-scale files;
    * at 100 TB the resulting open/footer/seek overhead dominates scan
    * time and crushes the driver's file index). Sizes the rewrite from
    * the ACTUAL on-disk bytes (compressed size ≈ rewritten size for the
    * same codec), one round-robin repartition to ceil(bytes/target)
    * writers. Returns the partition count used. LayoutSpec pins file
    * count and row parity. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: partitioned layouts (this library's own
    // novel/batch=N ingest output, hive-style dirs) keep their data
    // files in subdirectories — a top-level listing would see 0 bytes
    // and "compact" any table into a single file. Count every
    // non-hidden data file, NOT just *.parquet: Hive/Impala-style
    // writers emit suffix-less part files that spark.read.parquet
    // reads fine, and a suffix filter would reject the whole table.
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) bytes += f.getLen
    }
    require(bytes > 0, s"compact: no data files under $inPath")
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q97_zorder" -> q97ZOrder _,
    "q160_hilbert" -> q160HilbertOrder _)

  val oracle: Map[String, String] = Map(
    "q97_zorder" -> q97Sql,
    "q160_hilbert" -> q160Sql)
}
