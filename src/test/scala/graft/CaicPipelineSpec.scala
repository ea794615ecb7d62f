package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import com.fasterxml.jackson.databind.ObjectMapper
import graft.caic.{CaicModel, CaicPipeline}

/** Golden end-to-end test of the CAIC pipeline (SURVEY.md §5-1): hand-built
  * fixtures exercising every §7.4 semantic trap, compared field-by-field
  * against hand-derived expectations from the reference semantics
  * (task.ts:85-190).
  */
class CaicPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("caic-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val mapper = new ObjectMapper()
  private def jsonEq(a: String, b: String): Boolean =
    mapper.readTree(a) == mapper.readTree(b)

  // Areas fixture: duplicate id 101 (last wins), numeric id 202 (cast),
  // MultiPolygon on 202, id 303 for the unknown-rating case, id 404 unused.
  private val areasJson =
    """{"type":"FeatureCollection","features":[
      |{"type":"Feature","id":"101","properties":{"name":"stale"},
      | "geometry":{"type":"Polygon","coordinates":[[[0.0,0.0],[1.0,0.0],[1.0,1.0],[0.0,0.0]]]}},
      |{"type":"Feature","id":"101","properties":{"name":"fresh"},
      | "geometry":{"type":"Polygon","coordinates":[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]}},
      |{"type":"Feature","id":202,"properties":{},
      | "geometry":{"type":"MultiPolygon","coordinates":[
      |   [[[10.0,10.0],[11.0,10.0],[11.0,11.0],[10.0,10.0]]],
      |   [[[20.0,20.0],[21.0,20.0],[21.0,21.0],[20.0,20.0]]]]}},
      |{"type":"Feature","id":"303","properties":{},
      | "geometry":{"type":"Polygon","coordinates":[[[7.0,7.0],[8.0,7.0],[8.0,8.0],[7.0,7.0]]]}},
      |{"type":"Feature","id":"404","properties":{},
      | "geometry":{"type":"Polygon","coordinates":[[[9.0,9.0],[9.5,9.0],[9.5,9.5],[9.0,9.0]]]}}
      |]}""".stripMargin

  private def forecast(areaId: String, btl: String, tln: String, alp: String,
      remarks: String = "watch out"): String =
    s"""{"type":"avalancheforecast","id":"f-$areaId","publicName":"Zone $areaId",
       |"polygons":["$areaId"],"areaId":"$areaId","forecaster":"jdoe",
       |"issueDateTime":"2026-01-01T00:00:00Z","expiryDateTime":"2026-01-02T00:00:00Z",
       |"isTranslated":false,"weatherSummary":null,
       |"avalancheSummary":{"days":[{"date":"2026-01-01","content":"$remarks"},
       |  {"date":"2026-01-02","content":"day2 must not leak"}]},
       |"dangerRatings":{"days":[{"alp":"$alp","tln":"$tln","btl":"$btl"},
       |  {"alp":"extreme","tln":"extreme","btl":"extreme"}]}}""".stripMargin

  private val productsJson = "[" + Seq(
    forecast("101", btl = "low", tln = "considerable", alp = "high"),
    forecast("202", btl = "low", tln = "low", alp = "low"),
    forecast("303", btl = "gnarly", tln = "low", alp = "low"), // unknown → -1 wins
    forecast("999", btl = "low", tln = "low", alp = "low"),    // missing area → dropped
    // empty days → dropped (task.ts:137)
    """{"type":"avalancheforecast","id":"f-empty","publicName":"E","polygons":[],
      |"areaId":"404","forecaster":"x","issueDateTime":"t","expiryDateTime":"t",
      |"isTranslated":false,"weatherSummary":null,
      |"avalancheSummary":{"days":[]},
      |"dangerRatings":{"days":[{"alp":"low","tln":"low","btl":"low"}]}}""".stripMargin,
    // missing dangerRatings → dropped (task.ts:138)
    """{"type":"avalancheforecast","id":"f-nodr","publicName":"N","polygons":[],
      |"areaId":"404","forecaster":"x","issueDateTime":"t","expiryDateTime":"t",
      |"isTranslated":false,"weatherSummary":null,
      |"avalancheSummary":{"days":[{"date":"d","content":"c"}]}}""".stripMargin,
    // non-forecast product type → filtered (task.ts:114)
    """{"type":"avalanchewarning","title":"some other product"}"""
  ).mkString(",") + "]"

  private lazy val out = CaicPipeline.run(spark, areasJson, productsJson)
    .collect()
    .map(r => r.getAs[String]("id") -> r)
    .toMap

  test("row inventory: joins drop missing areas; filters drop bad days; Multi explodes") {
    assert(out.keySet === Set("caic-101", "caic-202-0", "caic-202-1", "caic-303"))
  }

  test("worst-rating ordinal min with dict lookups (101: high wins)") {
    val p = out("caic-101").getAs[org.apache.spark.sql.Row]("properties")
    assert(p.getAs[String]("callsign") === "High")
    assert(p.getAs[String]("fill") === "#ee1d23")
    assert(p.getAs[String]("stroke") === "#ee1d23")
    assert(p.getAs[Double]("fill-opacity") === 0.5)
    assert(p.getAs[Double]("stroke-opacity") === 0.75)
    assert(p.getAs[String]("remarks") === "watch out")
  }

  test("day-0 only: metadata carries day[0] ratings, not day[1]") {
    val m = out("caic-101").getAs[org.apache.spark.sql.Row]("properties")
      .getAs[org.apache.spark.sql.Row]("metadata")
    assert(m.getAs[String]("ratingAbove") === "high")
    assert(m.getAs[String]("ratingNear") === "considerable")
    assert(m.getAs[String]("ratingBelow") === "low")
    assert(m.getAs[String]("forecaster") === "jdoe")
    assert(m.getAs[Boolean]("isTranslated") === false)
  }

  test("unknown rating string wins the min and nulls the styling (§7.4-1)") {
    val p = out("caic-303").getAs[org.apache.spark.sql.Row]("properties")
    assert(p.getAs[String]("callsign") == null)
    assert(p.getAs[String]("fill") == null)
    assert(p.getAs[String]("stroke") == null)
    // remarks/metadata still populated
    assert(p.getAs[String]("remarks") === "watch out")
  }

  test("last-wins dedup on duplicate area ids (§7.4-4)") {
    val g = out("caic-101").getAs[String]("geometry")
    assert(jsonEq(g,
      """{"type":"Polygon","coordinates":[[[5.0,5.0],[6.0,5.0],[6.0,6.0],[5.0,5.0]]]}"""))
  }

  test("numeric feature id joins a string areaId (§7.4-5)") {
    assert(out.contains("caic-202-0"))
  }

  test("Multi explode: -idx ids, Multi stripped, parts split, props shared (§7.4-3)") {
    val g0 = out("caic-202-0").getAs[String]("geometry")
    val g1 = out("caic-202-1").getAs[String]("geometry")
    assert(jsonEq(g0,
      """{"type":"Polygon","coordinates":[[[10.0,10.0],[11.0,10.0],[11.0,11.0],[10.0,10.0]]]}"""))
    assert(jsonEq(g1,
      """{"type":"Polygon","coordinates":[[[20.0,20.0],[21.0,20.0],[21.0,21.0],[20.0,20.0]]]}"""))
    val p0 = out("caic-202-0").getAs[org.apache.spark.sql.Row]("properties")
    val p1 = out("caic-202-1").getAs[org.apache.spark.sql.Row]("properties")
    assert(p0 === p1) // byte-identical shared properties
    assert(p0.getAs[String]("callsign") === "Low")
    assert(p0.getAs[String]("fill") === "#4db748")
  }

  test("output metadata conforms to the emitted schema contract (task.ts:158-166)") {
    val out = CaicPipeline.run(spark, areasJson, productsJson)
    val metaType = out.schema("properties").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("metadata").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // same field names, order, and types (nullability is parser-dependent)
    assert(metaType.fields.map(f => (f.name, f.dataType)).toSeq ===
      CaicModel.outputMetadataType.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("introspection serves the DECLARED contract, every task.ts:69-78 field incl. rating") {
    import org.apache.spark.sql.types._
    // the reference's schema() response declares these 8 fields in this
    // order — including `rating` (task.ts:74), which control() never
    // populates; the introspection contract must advertise it anyway
    assert(CaicModel.outputSchema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("forecaster", StringType),      // task.ts:70
      ("issueDateTime", StringType),   // task.ts:71
      ("expiryDateTime", StringType),  // task.ts:72
      ("isTranslated", BooleanType),   // task.ts:73
      ("rating", StringType),          // task.ts:74
      ("ratingAbove", StringType),     // task.ts:75
      ("ratingNear", StringType),      // task.ts:76
      ("ratingBelow", StringType)))    // task.ts:77
    // declared = emitted + the never-populated `rating` — no other drift
    assert(CaicModel.declaredOutputMetadataType.fields.filterNot(_.name == "rating").toSeq ===
      CaicModel.outputMetadataType.fields.toSeq)
  }

  test("null/missing day-0 band wins the min like JS indexOf(undefined) = -1") {
    // btl absent from day 0: PERMISSIVE parsing null-pads it; JS
    // indexOf(undefined) = -1 must win the min and null the styling even
    // though the other bands are known ratings.
    val pj = "[" +
      """{"type":"avalancheforecast","id":"f-nb","publicName":"NB","polygons":["101"],
        |"areaId":"101","forecaster":"x","issueDateTime":"t","expiryDateTime":"t",
        |"isTranslated":false,"weatherSummary":null,
        |"avalancheSummary":{"days":[{"date":"d","content":"c"}]},
        |"dangerRatings":{"days":[{"alp":"high","tln":"considerable"}]}}""".stripMargin + "]"
    val rows = CaicPipeline.run(spark, areasJson, pj).collect()
    assert(rows.length === 1)
    val p = rows.head.getAs[org.apache.spark.sql.Row]("properties")
    assert(p.getAs[String]("callsign") == null)
    assert(p.getAs[String]("fill") == null)
    assert(p.getAs[org.apache.spark.sql.Row]("metadata").getAs[String]("ratingAbove") === "high")
  }

  test("FeatureCollection splice survives adversarial remarks and null geometry") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct}
    val df = Seq(
      ("f1", "Feature", "contains \"geometry\": literal", """{"type":"Point","coordinates":[1.0,2.0]}"""),
      ("f2", "Feature", "plain", null: String))
      .toDF("id", "type", "remarks", "geometry")
      .select(col("id"), col("type"), struct(col("remarks")).as("properties"), col("geometry"))
    val tree = mapper.readTree(CaicPipeline.toFeatureCollection(df))
    val feats = (0 until tree.get("features").size())
      .map(tree.get("features").get(_)).map(f => f.get("id").asText() -> f).toMap
    assert(feats("f1").get("properties").get("remarks").asText().contains("\"geometry\":"))
    assert(feats("f1").get("geometry").get("type").asText() === "Point")
    assert(feats("f2").get("geometry").isNull)
  }

  test("FeatureCollection assembly is valid JSON with all features") {
    val fc = CaicPipeline.toFeatureCollection(
      CaicPipeline.run(spark, areasJson, productsJson))
    val tree = mapper.readTree(fc)
    assert(tree.get("type").asText() === "FeatureCollection")
    assert(tree.get("features").size() === 4)
    val ids = (0 until 4).map(i => tree.get("features").get(i).get("id").asText()).toSet
    assert(ids === Set("caic-101", "caic-202-0", "caic-202-1", "caic-303"))
    // geometry re-enters as structured JSON, not a quoted string
    val f0 = (0 until 4).map(tree.get("features").get(_))
      .find(_.get("id").asText() == "caic-202-0").get
    assert(f0.get("geometry").get("type").asText() === "Polygon")
    assert(f0.get("geometry").get("coordinates").isArray)
  }
}
