package graft.caic

import org.apache.spark.sql.types._

/** Schemas for the CAIC avalanche-forecast pipeline (the reference
  * workload): GeoJSON forecast-area FeatureCollection + product records.
  *
  * Mirrors the reference's TypeBox declarations (task.ts:8-52):
  *  - feature `id` is `string | number` (task.ts:12) → declared StringType;
  *    Spark's JSON parser reads a numeric token into a StringType field as
  *    its literal text, which is exactly the `String(feat.id)` cast the
  *    reference applies (task.ts:99).
  *  - `properties` / `geometry` are `Type.Any` (task.ts:13-14) and GeoJSON
  *    coordinates are ragged (Polygon vs MultiPolygon nest differently), so
  *    both stay opaque JSON strings (SURVEY.md §7.4-2); Spark captures the
  *    raw JSON text when an object/array token meets a StringType field.
  *  - `weatherSummary` is `Type.Unknown` (task.ts:29), never read → JSON
  *    string for fidelity.
  */
object CaicModel {

  val dayContentType: StructType = StructType(Seq(
    StructField("date", StringType),     // task.ts:32
    StructField("content", StringType))) // task.ts:33

  val dangerDayType: StructType = StructType(Seq(
    StructField("alp", StringType),  // task.ts:38
    StructField("tln", StringType),  // task.ts:39
    StructField("btl", StringType))) // task.ts:40

  /** AvalancheForecastSchema, task.ts:18-43. The permissive union fallback
    * (task.ts:45-52) is served by PERMISSIVE parse mode: a non-forecast
    * product null-pads everything but `type`, surviving until the type
    * filter exactly like the reference's open record. */
  val productType: StructType = StructType(Seq(
    StructField("type", StringType),            // task.ts:19 (discriminator)
    StructField("id", StringType),              // task.ts:20
    StructField("title", StringType),           // task.ts:21 (optional)
    StructField("publicName", StringType),      // task.ts:22
    StructField("polygons", ArrayType(StringType)), // task.ts:23
    StructField("areaId", StringType),          // task.ts:24 (join key)
    StructField("forecaster", StringType),      // task.ts:25
    StructField("issueDateTime", StringType),   // task.ts:26 — stays string
    StructField("expiryDateTime", StringType),  // task.ts:27 — stays string
    StructField("isTranslated", BooleanType),   // task.ts:28
    StructField("weatherSummary", StringType),  // task.ts:29 (unknown, unused)
    StructField("avalancheSummary", StructType(Seq(
      StructField("days", ArrayType(dayContentType))))), // task.ts:30-35
    StructField("dangerRatings", StructType(Seq(
      StructField("days", ArrayType(dangerDayType))))))) // task.ts:36-42

  /** FeatureCollectionSchema, task.ts:8-16. */
  val featureType: StructType = StructType(Seq(
    StructField("type", StringType),        // task.ts:11 Literal('Feature')
    StructField("id", StringType),          // task.ts:12 union → string
    StructField("properties", StringType),  // task.ts:13 Any → raw JSON
    StructField("geometry", StringType)))   // task.ts:14 Any → raw JSON

  val featureCollectionType: StructType = StructType(Seq(
    StructField("type", StringType),        // task.ts:9 Literal
    StructField("features", ArrayType(featureType)))) // task.ts:10

  /** EMITTED output feature-metadata schema: the fields `control()`
    * actually writes (task.ts:158-166 populates ratingAbove/Near/Below,
    * never a bare `rating`). `CaicPipeline.run`'s `properties.metadata`
    * struct must conform; asserted in CaicPipelineSpec. */
  val outputMetadataType: StructType = StructType(Seq(
    StructField("forecaster", StringType),     // task.ts:70
    StructField("issueDateTime", StringType),  // task.ts:71 (date-time)
    StructField("expiryDateTime", StringType), // task.ts:72
    StructField("isTranslated", BooleanType),  // task.ts:73
    StructField("ratingAbove", StringType),    // task.ts:75
    StructField("ratingNear", StringType),     // task.ts:76
    StructField("ratingBelow", StringType)))   // task.ts:77

  /** DECLARED output feature-metadata schema (task.ts:69-78) — the full
    * contract the reference serves on a schema introspection request,
    * including `rating` (task.ts:74), which the declaration advertises
    * but `control()` never populates (task.ts:158-166 writes only the
    * elevation-band ratings). The divergence is the reference's, mirrored
    * faithfully: introspection (entry point 3) serves THIS schema; the
    * emitted rows conform to `outputMetadataType` above. */
  val declaredOutputMetadataType: StructType = StructType(Seq(
    StructField("forecaster", StringType),     // task.ts:70
    StructField("issueDateTime", StringType),  // task.ts:71 (date-time)
    StructField("expiryDateTime", StringType), // task.ts:72
    StructField("isTranslated", BooleanType),  // task.ts:73
    StructField("rating", StringType),         // task.ts:74 (declared, never emitted)
    StructField("ratingAbove", StringType),    // task.ts:75
    StructField("ratingNear", StringType),     // task.ts:76
    StructField("ratingBelow", StringType)))   // task.ts:77

  /** Schema introspection (entry point 3, task.ts:59-83): input config
    * schema is the engine's job-config concern; output is the DECLARED
    * metadata contract — `rating` included, exactly as the reference
    * advertises it. */
  def outputSchema: StructType = declaredOutputMetadataType

  /** Ordinal severity scale, task.ts:116 — position = rank, 0 worst. */
  val severity: Seq[String] =
    Seq("extreme", "high", "considerable", "moderate", "low", "noRating")

  /** task.ts:118-125. */
  val humanSeverity: Map[String, String] = Map(
    "extreme" -> "Extreme", "high" -> "High",
    "considerable" -> "Considerable", "moderate" -> "Moderate",
    "low" -> "Low", "noRating" -> "No Rating")

  /** task.ts:127-134. */
  val fills: Map[String, String] = Map(
    "extreme" -> "#221e1f", "high" -> "#ee1d23",
    "considerable" -> "#f8931d", "moderate" -> "#fef102",
    "low" -> "#4db748", "noRating" -> "#ffffff")
}
