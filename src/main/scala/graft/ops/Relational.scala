package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Core relational operator surface (SURVEY.md §2B: joins, aggregation,
  * windows, sort/limit, set ops, rollup/cube/grouping-sets, scalar fns).
  *
  * Every query here is declarative DataFrame API so Catalyst gets full
  * freedom: predicate pushdown into the parquet scan, column pruning, join
  * reordering, AQE. Scale notes are on each query.
  *
  * Numeric-compat conventions vs the DuckDB oracle:
  *  - every DOUBLE aggregate is `round(x, n)` on BOTH sides;
  *  - anything DuckDB reports as BIGINT (count, length, row_number, year,
  *    datediff, ...) is `.cast("long")` on the Spark side;
  *  - DuckDB `sum(INTEGER)` promotes to HUGEINT → the oracle SQL casts back
  *    to BIGINT;
  *  - every query has a total deterministic ORDER BY;
  *  - sort keys that can be NULL (rollup/cube) use NULLS FIRST on both
  *    sides (Spark's asc default; DuckDB must say it explicitly).
  */
object Relational {

  /** TPC-H Q1 shape: scan-heavy partial+final hash aggregation. At scale
    * this is one shuffle of a tiny grouped state (|flags|x|status| groups);
    * the filter is pushed into the parquet scan. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        // averages as bit-agreed-numerator / count, unrounded: integer-
        // valued sums are order-independent-exact and 2-decimal sums
        // bit-agree after round(.,2), so the quotient is bit-identical
        // across engines — while round(avg,4) can land on a decimal tie
        // where engine tie-rules differ (see q22)
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (round(sum(col("l_extendedprice")), 2) / count(lit(1))).as("avg_price"),
        (round(sum(col("l_discount")), 2) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    "SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, " +
      "round(sum(l_extendedprice),2) AS sum_base_price, " +
      "round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price, " +
      "sum(l_quantity)/count(*) AS avg_qty, round(sum(l_extendedprice),2)/count(*) AS avg_price, " +
      "round(sum(l_discount),2)/count(*) AS avg_disc, count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  /** TPC-H Q6 shape: fully-pushed-down selective filter + scalar agg. The
    * three predicates all reach the parquet reader (PushedFilters); no
    * shuffle beyond the single-row final agg. */
  def q02RevenueFilter(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q02Sql: String =
    "SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n_rows " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"

  /** TPC-H Q3 shape: 3-way join + agg + top-k. customer is the small side
    * (filtered on segment) → broadcast; orders⋈lineitem shuffles on the
    * order key, which AQE can coalesce. Top-k uses TakeOrderedAndProject
    * (no global sort materialization). */
  def q03TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = lineitem(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    "SELECT o_orderkey, o_orderdate, o_orderpriority, " +
      "round(sum(l_extendedprice*(1-l_discount)),2) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey=o_orderkey " +
      "JOIN customer ON o_custkey=c_custkey " +
      "WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' " +
      "GROUP BY o_orderkey, o_orderdate, o_orderpriority " +
      "ORDER BY revenue DESC, o_orderkey LIMIT 10"

  /** Left-semi join (EXISTS): orders having a late-shipping lineitem.
    * Semi join avoids duplicating order rows pre-agg; at scale it shuffles
    * both sides on the order key once. */
  def q04OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val l = lineitem(spark, dir)
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    "SELECT o_orderpriority, count(*) AS order_count FROM orders WHERE EXISTS (" +
      "SELECT 1 FROM lineitem WHERE l_orderkey=o_orderkey AND l_shipdate > o_orderdate + INTERVAL 45 DAY) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  /** Left-anti join (NOT EXISTS): customers with no 1995 order. The anti
    * side is pre-filtered by year so the build input stays small. */
  def q05AntiCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o95 = orders(spark, dir).filter(year(col("o_orderdate")) === 1995)
    c.join(o95, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"), min(col("c_custkey")).as("min_custkey"))
      .orderBy(col("c_nationkey"))
  }

  val q05Sql: String =
    "SELECT c_nationkey, count(*) AS n_customers, min(c_custkey) AS min_custkey " +
      "FROM customer WHERE NOT EXISTS (" +
      "SELECT 1 FROM orders WHERE o_custkey=c_custkey AND year(o_orderdate)=1995) " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"

  /** TPC-H Q5 shape: fact table joined to a broadcast dimension chain
    * (supplier⋈nation⋈region is tiny at any SF — dims grow sublinearly).
    * One scan of lineitem, zero fact-side shuffles before the final agg. */
  def q06RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val dims = supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"), col("r_name"))
    lineitem(spark, dir)
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q06Sql: String =
    "SELECT r_name, n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, " +
      "count(*) AS n_lineitems FROM lineitem " +
      "JOIN supplier ON l_suppkey=s_suppkey JOIN nation ON s_nationkey=n_nationkey " +
      "JOIN region ON n_regionkey=r_regionkey GROUP BY r_name, n_name ORDER BY r_name, n_name"

  /** Windowed top-k per group: one shuffle on the partition key, no global
    * sort. Deterministic tiebreak on the order key. */
  def q07WindowTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  val q07Sql: String =
    "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
      "SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (" +
      "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) " +
      "WHERE rn <= 3 ORDER BY o_custkey, rn"

  /** Running aggregates + lag: explicit ROWS frame so both engines
    * accumulate in the identical (fully ordered) sequence. */
  def q08WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(sum(col("o_totalprice")).over(wsum), 2).as("cum_spend"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).cast("long").as("days_since_prev"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val q08Sql: String =
    "SELECT o_custkey, o_orderkey, o_orderdate, " +
      "round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS cum_spend, " +
      "date_diff('day', CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey " +
      "ORDER BY o_orderdate, o_orderkey) AS DATE), CAST(o_orderdate AS DATE)) AS days_since_prev " +
      "FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"

  /** Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps
    * + driver merge, never a full sort at scale. */
  def q09GlobalTopk(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val q09Sql: String =
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
      "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"

  /** Exact multi-distinct aggregation (Spark expands to a double
    * aggregation; the oracle checks the exact path — the HLL approximate
    * path is q10b, rows-only). */
  def q10DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q10Sql: String =
    "SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp, " +
      "count(DISTINCT l_partkey) AS n_part, count(*) AS n_rows " +
      "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"

  /** Approximate distinct via HLL++ — the 100 TB path where exact distinct
    * would shuffle every key. No SQL oracle (algorithm-specific); the
    * driver records a rows-only check, and the spec bounds the error. */
  def q10bApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** INTERSECT (distinct semantics on both engines). */
  def q11Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
    y95.intersect(y96).orderBy(col("custkey"))
  }

  val q11Sql: String =
    "SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1995 " +
      "INTERSECT SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1996 ORDER BY custkey"

  /** EXCEPT (distinct): customers that never ordered in 1995. */
  def q12Except(spark: SparkSession, dir: String): DataFrame = {
    val all = customer(spark, dir).select(col("c_custkey").as("custkey"))
    val y95 = orders(spark, dir).filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("custkey"))
    all.except(y95).orderBy(col("custkey"))
  }

  val q12Sql: String =
    "SELECT c_custkey AS custkey FROM customer " +
      "EXCEPT SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1995 ORDER BY custkey"

  /** INTERSECT ALL: duplicate-preserving intersection (multiset min of
    * per-side multiplicities). A customer with 3 orders in 1995 and 2 in
    * 1996 appears exactly twice. Planned as a count-compare aggregate —
    * one shuffle on the key, no join explosion. */
  def q62IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
    y95.intersectAll(y96).orderBy(col("custkey"))
  }

  val q62Sql: String =
    "SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1995 " +
      "INTERSECT ALL SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1996 ORDER BY custkey"

  /** EXCEPT ALL: duplicate-preserving difference (multiplicity minus,
    * floored at zero) — same count-compare plan shape as q62. */
  def q63ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = orders(spark, dir)
    val y95 = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("custkey"))
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("custkey"))
    y95.exceptAll(y96).orderBy(col("custkey"))
  }

  val q63Sql: String =
    "SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1995 " +
      "EXCEPT ALL SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate)=1996 ORDER BY custkey"

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): nation 10
    * is mapped to NULL on both pre-aggregated sides, and the null-safe
    * comparison matches the two null groups where a plain `=` would drop
    * them. The null-keyed rows collapse into one group per side BEFORE
    * the join, so no null-key blowup. */
  def q76NullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
      .groupBy(nullif(col("c_nationkey"), lit(10)).as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val s = supplier(spark, dir)
      .groupBy(nullif(col("s_nationkey"), lit(10)).as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, col("ck") <=> col("sk"))
      .select(col("ck").as("nationkey"), col("n_cust"), col("n_supp"))
      .orderBy(asc_nulls_first("nationkey"))
  }

  val q76Sql: String =
    "SELECT ck AS nationkey, n_cust, n_supp FROM " +
      "(SELECT nullif(c_nationkey, 10) AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c " +
      "JOIN (SELECT nullif(s_nationkey, 10) AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) s " +
      "ON ck IS NOT DISTINCT FROM sk ORDER BY nationkey NULLS FIRST"

  /** ROLLUP: hierarchical subtotals in one pass (Expand + single shuffle).
    * grouping_id disambiguates NULL-as-subtotal from NULL-as-value. */
  def q13Rollup(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val q13Sql: String =
    "SELECT l_returnflag, l_linestatus, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
      "round(sum(l_quantity),2) AS sum_qty, count(*) AS n FROM lineitem " +
      "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
      "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"

  /** CUBE over two dimensions. */
  def q14Cube(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy(col("gid"), asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  val q14Sql: String =
    "SELECT l_returnflag, l_linestatus, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
      "round(sum(l_extendedprice),2) AS sum_price, count(*) AS n FROM lineitem " +
      "GROUP BY CUBE(l_returnflag, l_linestatus) " +
      "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"

  /** GROUPING SETS via the SQL dialect (registered temp views). */
  def q15GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    lineitem(spark, dir).createOrReplaceTempView("lineitem")
    spark.sql(
      "SELECT l_returnflag, l_linestatus, CAST(grouping_id() AS BIGINT) AS gid, " +
        "round(sum(l_quantity),2) AS sum_qty, count(*) AS n FROM lineitem " +
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
        "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
  }

  val q15Sql: String =
    "SELECT l_returnflag, l_linestatus, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid, " +
      "round(sum(l_quantity),2) AS sum_qty, count(*) AS n FROM lineitem " +
      "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) " +
      "ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"

  /** String scalar functions (§2A-13 generalized) — all codegen'd builtins,
    * no UDFs, so the whole projection stays in one WholeStageCodegen span. */
  def q16StringFuncs(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir).select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      lower(col("p_type")).as("type_l"),
      substring(col("p_name"), 1, 10).as("name10"),
      concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"),
      length(col("p_name")).cast("long").as("name_len"),
      regexp_replace(col("p_type"), " ", "_").as("type_us"),
      levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("lev"))
      .orderBy(col("p_partkey"))

  val q16Sql: String =
    "SELECT p_partkey, upper(p_brand) AS brand_u, lower(p_type) AS type_l, " +
      "substr(p_name,1,10) AS name10, concat(p_brand,'|',p_type) AS brand_type, " +
      "length(p_name) AS name_len, replace(p_type,' ','_') AS type_us, " +
      "levenshtein(p_brand,'Brand#33') AS lev FROM part ORDER BY p_partkey"

  /** Date/time scalar functions (§2A-18 generalized). */
  def q17DateFuncs(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mon"),
      date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since_95"))
      .orderBy(col("o_orderkey"))

  val q17Sql: String =
    "SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mon, " +
      "date_trunc('month', o_orderdate) AS month_start, " +
      "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95 " +
      "FROM orders ORDER BY o_orderkey"

  /** Equi + range (interval) join: the equi key does the partitioning, the
    * range predicate is evaluated post-shuffle — no O(n²) blowup. */
  def q18RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val o = orders(spark, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  val q18Sql: String =
    "SELECT o_orderpriority, count(*) AS n, round(sum(l_extendedprice),2) AS sum_price " +
      "FROM lineitem JOIN orders ON l_orderkey=o_orderkey " +
      "AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 60 DAY " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"

  /** Pure theta (band) join against a tiny in-memory dimension — broadcast
    * nested loop, the right plan when one side is a handful of rows. */
  def q19BandJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.createDataFrame(Seq(
      ("low", 0.0, 100000.0),
      ("mid", 100000.0, 300000.0),
      ("high", 300000.0, 1.0e18)
    )).toDF("band", "lo", "hi")
    orders(spark, dir)
      .join(broadcast(bands), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("band"))
  }

  val q19Sql: String =
    "SELECT band, count(*) AS n_orders, round(sum(o_totalprice),2) AS total " +
      "FROM orders JOIN (VALUES ('low',0.0,100000.0),('mid',100000.0,300000.0)," +
      "('high',300000.0,1e18)) AS b(band,lo,hi) " +
      "ON o_totalprice >= lo AND o_totalprice < hi GROUP BY band ORDER BY band"

  /** posexplode + two-branch union + dictionary lookup — the generalized
    * form of the reference's Multi-geometry explode (§2A-15/16) and dict
    * projection (§2A-12). */
  def q20ExplodeUnion(spark: SparkSession, dir: String): DataFrame = {
    val p = part(spark, dir)
    val words = p.select(col("p_partkey"), col("p_size"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .select(col("p_partkey"), col("p_size"), col("pos").cast("long").as("pos"), col("word"))
    val brands = p.select(col("p_partkey"), col("p_size"),
      lit(-1L).as("pos"), col("p_brand").as("word"))
    words.unionByName(brands)
      .select(col("p_partkey"), col("pos"), col("word"),
        when(col("p_size") < 10, "S").when(col("p_size") < 25, "M").otherwise("L").as("size_class"))
      .orderBy(col("p_partkey"), col("pos"), col("word"))
  }

  val q20Sql: String =
    "WITH t AS (SELECT p_partkey, p_size, p_brand, string_split(p_name,' ') AS ws FROM part), " +
      "ex AS (SELECT p_partkey, p_size, unnest(range(0, len(ws))) AS pos, unnest(ws) AS word FROM t) " +
      "SELECT p_partkey, pos, word, CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 25 THEN 'M' ELSE 'L' END AS size_class " +
      "FROM (SELECT * FROM ex UNION ALL SELECT p_partkey, p_size, CAST(-1 AS BIGINT) AS pos, p_brand AS word FROM t) " +
      "ORDER BY p_partkey, pos, word"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> q01PricingSummary _,
    "q02_revenue_filter" -> q02RevenueFilter _,
    "q03_top_revenue" -> q03TopRevenue _,
    "q04_order_priority_semi" -> q04OrderPriority _,
    "q05_anti_customers" -> q05AntiCustomers _,
    "q06_region_revenue" -> q06RegionRevenue _,
    "q07_window_topk" -> q07WindowTopk _,
    "q08_window_running" -> q08WindowRunning _,
    "q09_global_topk" -> q09GlobalTopk _,
    "q10_distinct_agg" -> q10DistinctAgg _,
    "q10b_approx_distinct" -> q10bApproxDistinct _,
    "q11_intersect" -> q11Intersect _,
    "q12_except" -> q12Except _,
    "q13_rollup" -> q13Rollup _,
    "q14_cube" -> q14Cube _,
    "q15_grouping_sets" -> q15GroupingSets _,
    "q16_string_funcs" -> q16StringFuncs _,
    "q17_date_funcs" -> q17DateFuncs _,
    "q18_range_join" -> q18RangeJoin _,
    "q19_band_join" -> q19BandJoin _,
    "q20_explode_union" -> q20ExplodeUnion _,
    "q62_intersect_all" -> q62IntersectAll _,
    "q63_except_all" -> q63ExceptAll _,
    "q76_nullsafe_join" -> q76NullSafeJoin _
  )

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_revenue_filter" -> q02Sql,
    "q03_top_revenue" -> q03Sql,
    "q04_order_priority_semi" -> q04Sql,
    "q05_anti_customers" -> q05Sql,
    "q06_region_revenue" -> q06Sql,
    "q07_window_topk" -> q07Sql,
    "q08_window_running" -> q08Sql,
    "q09_global_topk" -> q09Sql,
    "q10_distinct_agg" -> q10Sql,
    "q11_intersect" -> q11Sql,
    "q12_except" -> q12Sql,
    "q13_rollup" -> q13Sql,
    "q14_cube" -> q14Sql,
    "q15_grouping_sets" -> q15Sql,
    "q16_string_funcs" -> q16Sql,
    "q17_date_funcs" -> q17Sql,
    "q18_range_join" -> q18Sql,
    "q19_band_join" -> q19Sql,
    "q20_explode_union" -> q20Sql,
    "q62_intersect_all" -> q62Sql,
    "q63_except_all" -> q63Sql,
    "q76_nullsafe_join" -> q76Sql
  )
}
