package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Skew-mitigation join (SURVEY.md §2B / 100 TB design note: "skewed keys
  * → salting or AQE skew-join"). AQE's skew-join handles most cases at
  * runtime; explicit salting is the deterministic fallback when one key's
  * rows exceed what a single task can hold even after AQE splitting.
  *
  * Shape: fact rows get a uniform salt in [0, S); the (small) build side
  * is replicated S× with every salt value; the join key becomes
  * (key, salt). Each formerly-hot key now spreads across S tasks. Cost:
  * S× replication of the small side — which is why the technique pairs
  * with a pre-aggregated or dimension-sized right side.
  */
object SkewJoin {

  /** Inner equi-join of `fact ⋈ dim` on `factKey = dimKey`, salted S ways.
    * Result is row-identical to the unsalted join (salt values only route
    * rows; they never change the match set). */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame,
      factKey: Column, dimKey: Column, salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", (rand(42) * salt).cast("int"))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(explodedDim,
        factKey === dimKey && saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }

  /** Oracle-checked query: salted lineitem⋈supplier, aggregated per
    * nation. The oracle runs the PLAIN join — passing proves the salted
    * plan changes routing, not results. */
  def q49SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = lineitem(spark, dir)
    val s = supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    saltedInnerJoin(l, s, col("l_suppkey"), col("s_suppkey"), salt = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("s_nationkey"))
  }

  val q49Sql: String =
    "SELECT s_nationkey, count(*) AS n, round(sum(l_extendedprice),2) AS sum_price " +
      "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
      "GROUP BY s_nationkey ORDER BY s_nationkey"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_salted_join" -> q49SaltedJoin _)

  val oracle: Map[String, String] = Map(
    "q49_salted_join" -> q49Sql)
}
