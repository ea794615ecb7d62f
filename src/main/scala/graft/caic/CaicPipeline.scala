package graft.caic

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import CaicModel._

/** The reference dataflow (task.ts:85-190) re-expressed as one declarative
  * DataFrame composition. Every semantic trap from SURVEY.md §7.4 is
  * preserved and unit-tested in CaicPipelineSpec:
  *
  *  - last-wins dedup of duplicate area ids (Map.set, task.ts:97-100)
  *  - inner-join row drop on missing area (task.ts:140-141)
  *  - JS `indexOf → -1` worst-rating semantics: an unknown rating string
  *    WINS the min and styles resolve to null (task.ts:143-146, §7.4-1)
  *  - only days[0] is consulted (task.ts:144-146,157,163-165)
  *  - null/empty nested `days` drops the row (task.ts:137-138)
  *  - Multi-geometry explode: one feature per part, `-idx` id suffix,
  *    first `Multi` stripped from the type, properties shared across
  *    parts (task.ts:171-183)
  *
  * Scale shape: areas (build side) is tiny → broadcast hash join; products
  * scan stays embarrassingly parallel; the only window is the last-wins
  * dedup over the (small) areas side. At 100 TB of products the plan is
  * scan → filter → broadcast-join → project → explode, zero fact-side
  * shuffles.
  */
object CaicPipeline {

  // ---------------------------------------------------------------- sources

  /** Parse a FeatureCollection document (task.ts:95) into one row per
    * feature, keyed by stringified id, with last-wins dedup on duplicate
    * ids (task.ts:97-100: `Map.set` keeps the final occurrence).
    * `pos` (array position) is the ingest-order tiebreak. */
  def areaFeatures(spark: SparkSession, fcJson: DataFrame): DataFrame = {
    val parsed = fcJson.select(
      from_json(col("value"), featureCollectionType, jsonOpts).as("fc"))
    val exploded = parsed
      .select(posexplode(col("fc.features")).as(Seq("pos", "f")))
      .select(col("pos"), col("f.id").as("id"),
        col("f.properties").as("properties"), col("f.geometry").as("geometry"))
    val lastWins = Window.partitionBy(col("id")).orderBy(col("pos").desc)
    exploded
      .withColumn("rn", row_number().over(lastWins))
      .filter(col("rn") === 1)
      .drop("rn", "pos")
  }

  /** Parse the products document (a JSON array, task.ts:107) into one row
    * per product. PERMISSIVE mode reproduces the reference's union schema
    * (task.ts:45-52): records that aren't forecasts keep `type` and
    * null-pad the rest, surviving until the type filter. */
  def products(spark: SparkSession, productsJson: DataFrame): DataFrame =
    productsJson
      .select(explode(from_json(col("value"), ArrayType(productType), jsonOpts)).as("p"))
      .select(col("p.*"))

  private val jsonOpts = Map("mode" -> "PERMISSIVE")

  // ------------------------------------------------------------- worst rating

  /** JS `Array.indexOf` over the severity scale (task.ts:144-146):
    * 0-based position, or -1 when the string is unknown. Spark's
    * `array_position` is 1-based and returns 0 on miss, so `- 1` lands
    * exactly on JS semantics including the §7.4-1 trap (unknown → -1,
    * which then WINS the min because -1 < every real index). */
  def jsIndexOf(c: Column): Column =
    (array_position(typedLit(severity), c) - 1).cast("int")

  /** Worst-case rating index across the three elevation bands of day 0,
    * seeded with noRating (task.ts:143-146). Sequential `if <` chains are
    * order-independent here: equivalent to the 4-way min. A null/missing
    * band (PERMISSIVE null-padding) must behave like JS
    * `indexOf(undefined)` = -1 and WIN the min — but `least` skips nulls,
    * so the null jsIndexOf result is pinned to -1 explicitly. */
  def severityIndex(btl: Column, tln: Column, alp: Column): Column =
    least(lit(severity.indexOf("noRating")),
      coalesce(jsIndexOf(btl), lit(-1)),
      coalesce(jsIndexOf(tln), lit(-1)),
      coalesce(jsIndexOf(alp), lit(-1)))

  /** `severity[severityIndex]` — JS yields `undefined` for index -1, and
    * `humanSeverity[undefined]`/`fills[undefined]` are `undefined` too
    * (dropped JSON keys). Spark representation: null (§7.4-1 decision:
    * byte-faithful). */
  def severityKey(sevIdx: Column): Column =
    when(sevIdx >= 0, element_at(typedLit(severity), sevIdx + 1))

  // ---------------------------------------------------------------- pipeline

  /** forecasts(filtered) ⋈ areas → styled output features, pre-explode.
    * One output row per joined forecast (task.ts:136-169). */
  def joined(forecasts: DataFrame, areas: DataFrame): DataFrame = {
    val day0 = element_at(col("dangerRatings.days"), 1)
    val sevIdx = severityIndex(day0("btl"), day0("tln"), day0("alp"))
    val sevKey = severityKey(col("sev_idx"))
    forecasts
      // type filter + union narrowing (task.ts:114)
      .filter(col("type") === "avalancheforecast")
      // null-safe empty/missing days drop (task.ts:137-138, §7.4-8)
      .filter(coalesce(size(col("avalancheSummary.days")), lit(0)) > 0 &&
        coalesce(size(col("dangerRatings.days")), lit(0)) > 0)
      // lookup join; missing key ⇒ drop (task.ts:140-141); areas is tiny
      .join(broadcast(areas), col("areaId") === areas("id"), "inner")
      .withColumn("sev_idx", sevIdx)
      .withColumn("sev_key", sevKey)
      .select(
        concat(lit("caic-"), col("areaId")).as("id"), // task.ts:149
        lit("Feature").as("type"),
        struct(
          element_at(typedLit(humanSeverity), col("sev_key")).as("callsign"), // task.ts:152
          element_at(typedLit(fills), col("sev_key")).as("fill"),             // task.ts:153
          lit(0.5).as("fill-opacity"),                                        // task.ts:154
          element_at(typedLit(fills), col("sev_key")).as("stroke"),           // task.ts:155
          lit(0.75).as("stroke-opacity"),                                     // task.ts:156
          // conditional remarks with default (task.ts:157); the empty case
          // is unreachable post-filter but kept for fidelity
          when(size(col("avalancheSummary.days")) > 0,
            element_at(col("avalancheSummary.days"), 1)("content"))
            .otherwise("No Remarks").as("remarks"),
          struct(                                                             // task.ts:158-166
            col("forecaster"),
            col("issueDateTime"),
            col("expiryDateTime"),
            col("isTranslated"),
            element_at(col("dangerRatings.days"), 1)("alp").as("ratingAbove"),
            element_at(col("dangerRatings.days"), 1)("tln").as("ratingNear"),
            element_at(col("dangerRatings.days"), 1)("btl").as("ratingBelow")
          ).as("metadata")
        ).as("properties"),
        col("geometry"))
  }

  /** Multi-geometry explode + union (task.ts:171-186, §2A-15/16).
    * Geometry is an opaque JSON string; parts are pulled out by parsing
    * `$.coordinates` as `array<string>` — each element keeps its raw JSON
    * text, sidestepping the ragged-nesting problem (§7.4-2). The rebuilt
    * part geometry gets the first `Multi` stripped from its type
    * (JS `replace('Multi','')` → regexp `^Multi`, task.ts:179). */
  def explodeMulti(features: DataFrame): DataFrame = {
    val geomType = get_json_object(col("geometry"), "$.type")
    val multi = features.filter(geomType.startsWith("Multi")) // task.ts:171
    val single = features.filter(!geomType.startsWith("Multi"))
    val parts = multi
      .select(col("id"), col("type"), col("properties"), col("geometry"),
        posexplode(from_json(get_json_object(col("geometry"), "$.coordinates"),
          ArrayType(StringType))).as(Seq("idx", "part")))
      .select(
        concat(col("id"), lit("-"), col("idx")).as("id"), // task.ts:174
        col("type"),
        col("properties"), // shared by reference across parts (§7.4-3)
        concat(lit("{\"type\":\""),
          regexp_replace(geomType, "^Multi", ""), // task.ts:179
          lit("\",\"coordinates\":"), col("part"),
          lit("}")).as("geometry"))
    parts.unionByName(single) // task.ts:173,185 append order is per-feature;
    // output ordering is asserted set-wise (a FeatureCollection is a set
    // keyed by feature id for the consumer)
  }

  /** Full pipeline: raw JSON documents → output features. */
  def run(spark: SparkSession, areasJson: String, productsJson: String): DataFrame = {
    import spark.implicits._
    val areas = areaFeatures(spark, Seq(areasJson).toDF("value"))
    val fcst = products(spark, Seq(productsJson).toDF("value"))
    explodeMulti(joined(fcst, areas))
  }

  /** Assemble the output FeatureCollection (task.ts:109-112,189) as a
    * single JSON document. Driver-side collect is faithful to the
    * reference sink; the scaled path writes features line-delimited via
    * `df.write.json` instead. */
  def toFeatureCollection(features: DataFrame): String = {
    // Serialize everything EXCEPT geometry, then append the raw geometry
    // JSON before the closing brace — no needle search, so free-text
    // fields containing the literal `"geometry":` can't misdirect the
    // splice, and a null geometry degrades to an explicit `null` member
    // (JSON.stringify semantics) instead of corrupting the document.
    val rows = features
      .select(to_json(struct(
        col("id"), col("type"),
        col("properties"))).as("j"), col("geometry"))
      .collect()
      .map { r =>
        val j = r.getString(0)
        val g = if (r.isNullAt(1)) "null" else r.getString(1)
        j.dropRight(1) + ",\"geometry\":" + g + "}"
      }
    s"""{"type":"FeatureCollection","features":[${rows.mkString(",")}]}"""
  }
}
