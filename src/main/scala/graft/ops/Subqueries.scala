package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Subquery-class operators: correlated scalar subqueries, IN / NOT IN
  * subqueries, uncorrelated scalar subqueries, CTEs. Expressed through the
  * SQL dialect (`spark.sql`) — Catalyst decorrelates each into the same
  * joins/aggregates the DataFrame API would build, so the 100 TB story is
  * the underlying join plan, not the subquery syntax. The same SQL text
  * runs on DuckDB, which makes these the strongest cross-engine checks in
  * the suite (zero translation).
  */
object Subqueries {

  private def sql2(spark: SparkSession, dir: String, q: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation", "region")
      .foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(q)
  }

  /** TPC-H Q17 shape — correlated scalar subquery (per-part average):
    * decorrelates to an aggregate + join on p_partkey. */
  val q51Sql: String =
    "SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly FROM lineitem, part " +
      "WHERE p_partkey = l_partkey AND p_brand = 'Brand#23' " +
      "AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem WHERE l_partkey = p_partkey)"

  def q51CorrelatedScalar(spark: SparkSession, dir: String): DataFrame =
    sql2(spark, dir, q51Sql)

  /** IN + NOT IN subqueries (decorrelate to semi/anti joins): customers
    * who ordered in 1995 but never with priority '1-URGENT'. */
  val q52Sql: String =
    "SELECT c_nationkey, count(*) AS n_customers FROM customer " +
      "WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995) " +
      "AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"

  def q52InNotIn(spark: SparkSession, dir: String): DataFrame =
    sql2(spark, dir, q52Sql)

  /** TPC-H Q22 shape — uncorrelated scalar subquery (global average) as a
    * filter bound, plus an anti-join, inside a CTE. */
  val q53Sql: String =
    "WITH rich AS (SELECT c_custkey, c_acctbal, c_nationkey FROM customer " +
      "WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)) " +
      "SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal " +
      "FROM rich WHERE NOT EXISTS (SELECT 1 FROM orders " +
      "WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') " +
      "GROUP BY c_nationkey ORDER BY c_nationkey"

  def q53CteScalar(spark: SparkSession, dir: String): DataFrame =
    sql2(spark, dir, q53Sql)

  /** Positive correlated EXISTS (§2B subqueries row; Catalyst
    * decorrelates to a left-semi join). Zero-translation SQL: the same
    * text runs on both engines. */
  val q75Sql: String =
    "SELECT n_nationkey, n_name FROM nation n WHERE EXISTS (" +
      "SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) " +
      "ORDER BY n_nationkey"

  def q75Exists(spark: SparkSession, dir: String): DataFrame =
    sql2(spark, dir, q75Sql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q51_correlated_scalar" -> q51CorrelatedScalar _,
    "q52_in_notin" -> q52InNotIn _,
    "q53_cte_scalar" -> q53CteScalar _,
    "q75_exists" -> q75Exists _)

  val oracle: Map[String, String] = Map(
    "q51_correlated_scalar" -> q51Sql,
    "q52_in_notin" -> q52Sql,
    "q53_cte_scalar" -> q53Sql,
    "q75_exists" -> q75Sql)
}
