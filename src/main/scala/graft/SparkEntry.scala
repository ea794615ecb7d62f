package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator (SURVEY.md §2) to a
  * DataFrame builder over a scale-factor directory; `oracleSql` carries
  * the DuckDB-equivalent SQL for each hash-checked query (queries absent
  * from `oracleSql` are approximate/hash-seeded/fixture ops → rows-only).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Fact scan + broadcast dimension chain + grouped agg (SURVEY §2B). */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q06RegionRevenue(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++
      ops.TimeSeries.queries ++
      ops.Advanced.queries ++
      sources.SourceQueries.queries ++
      ops.SkewJoin.queries ++
      ops.Subqueries.queries ++
      ops.DataPrep.queries ++
      ops.Typed.queries ++
      text.TextAnalysis.queries ++
      dedup.Dedup.queries ++
      sim.Similarity.queries ++
      multimodal.Multimodal.queries ++
      // Reference-fidelity pipeline over deterministic fixtures (ignores
      // sfDir — the reference's inputs are HTTP JSON documents, not the
      // star schema). Golden-tested in CaicPipelineSpec; rows-only here.
      // `properties` is a struct; the driver's pandas harness can only
      // sort/hash scalar cells, so serialize it. Golden tests keep the
      // typed struct output covered.
      Map("q37_caic_pipeline" -> ((s: SparkSession, _: String) => {
        import org.apache.spark.sql.functions.{col, to_json}
        caic.CaicPipeline.run(s, caic.CaicFixtures.areasJson, caic.CaicFixtures.productsJson)
          .withColumn("properties", to_json(col("properties")))
      }))

  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++
      ops.TimeSeries.oracle ++
      ops.Advanced.oracle ++
      sources.SourceQueries.oracle ++
      ops.SkewJoin.oracle ++
      ops.Subqueries.oracle ++
      ops.DataPrep.oracle ++
      ops.Typed.oracle ++
      text.TextAnalysis.oracle ++
      dedup.Dedup.oracle ++
      sim.Similarity.oracle ++
      multimodal.Multimodal.oracle
}
