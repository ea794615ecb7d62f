package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.Tables._

/** Oracle-checked query exercising the custom DataSource V2 source
  * end-to-end: materialize documents as JSON-lines "response bodies",
  * scan them through `graft-jsondoc` with filters that get pushed into
  * the source, and verify the result against DuckDB over the original
  * parquet. */
object SourceQueries {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("n_chars", LongType)))

  /** Scratch path is per-JVM (graft.RunTag) so concurrent Verify runs at
    * different scale factors can never interleave write/read on a shared
    * layout — see RunTag's Scaladoc. */
  private[graft] def q48Base: String = graft.RunTag.scratch("jsondoc")

  def q48Dsv2Source(spark: SparkSession, dir: String): DataFrame = {
    val base = q48Base
    documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4) // several response files → several InputPartitions
      .write.mode("overwrite").json(base)
    spark.read.format("graft-jsondoc").schema(docSchema)
      .option("path", base).load()
      .filter(col("n_chars") > 500 && col("lang") === "en")
      .orderBy(col("doc_id"))
  }

  val q48Sql: String =
    "SELECT doc_id, lang, n_chars FROM documents " +
      "WHERE n_chars > 500 AND lang = 'en' ORDER BY doc_id"

  /** q168: source-side AGGREGATE pushdown through the same DSv2 source
    * (SupportsPushDownAggregates, partial mode) — the scan ships one
    * partial row of counts/min/max per response file instead of every
    * matching document, and Spark's final aggregate merges. The filter
    * is fully pushed (a precondition Spark enforces before pushing
    * aggregates); the mix covers COUNT(*), COUNT(col), and MIN/MAX over
    * both long and string columns. SourceSinkSpec pins the
    * PushedAggregates plan shape, the group-by refusal path, and the
    * null/empty-file partial edges on a hand-built fixture. */
  def q168Dsv2AggPushdown(spark: SparkSession, dir: String): DataFrame = {
    val base = q48Base
    documents(spark, dir).select(col("doc_id"), col("lang"), col("n_chars"))
      .repartition(4)
      .write.mode("overwrite").json(base)
    spark.read.format("graft-jsondoc").schema(docSchema)
      .option("path", base).load()
      .filter(col("n_chars") > 500)
      .agg(count(lit(1)).as("n_docs"),
        count(col("lang")).as("n_lang_nonnull"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        min(col("lang")).as("min_lang"),
        max(col("doc_id")).as("max_doc"))
  }

  val q168Sql: String =
    "SELECT count(*) AS n_docs, count(lang) AS n_lang_nonnull, " +
      "min(n_chars) AS min_chars, max(n_chars) AS max_chars, " +
      "min(lang) AS min_lang, max(doc_id) AS max_doc " +
      "FROM documents WHERE n_chars > 500"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_dsv2_source" -> q48Dsv2Source _,
    "q168_dsv2_agg_pushdown" -> q168Dsv2AggPushdown _)

  val oracle: Map[String, String] = Map(
    "q48_dsv2_source" -> q48Sql,
    "q168_dsv2_agg_pushdown" -> q168Sql)
}
