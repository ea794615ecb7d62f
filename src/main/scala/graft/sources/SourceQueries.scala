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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_dsv2_source" -> q48Dsv2Source _)

  val oracle: Map[String, String] = Map(
    "q48_dsv2_source" -> q48Sql)
}
