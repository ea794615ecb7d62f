package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Shared evaluator for [[GeoEnvelope]] — a static entry point so the
  * generated code stays inside whole-stage codegen (one virtual-free
  * static call per row, the regexp-function pattern). GeoJSON
  * coordinates are RAGGED (Point nests 1 deep, MultiPolygon 4), which
  * is exactly why the engine keeps geometry as an opaque JSON string
  * (SURVEY §1.2); the envelope walk is depth-agnostic: any array whose
  * first element is numeric is a POSITION `[x, y, ...]`, anything else
  * recurses. GeometryCollection recurses through `geometries`. */
object GeoEnvelopeHelper {
  private val mapper = new ObjectMapper()

  /** Envelope of one GeoJSON geometry document as
    * (xmin, ymin, xmax, ymax), or null for null/invalid/empty
    * geometry — SQL-null discipline, never a throw on data. */
  def eval(json: UTF8String): InternalRow = {
    if (json == null) return null
    try {
      val node = mapper.readTree(json.toString)
      var xmin = Double.PositiveInfinity
      var ymin = Double.PositiveInfinity
      var xmax = Double.NegativeInfinity
      var ymax = Double.NegativeInfinity
      def walkPositions(n: JsonNode): Unit =
        if (n != null && n.isArray && n.size() > 0) {
          if (n.get(0).isNumber) {
            // a position: [x, y, (z...)] — ignore any third dimension
            if (n.size() >= 2 && n.get(1).isNumber) {
              val x = n.get(0).asDouble(); val y = n.get(1).asDouble()
              if (x < xmin) xmin = x; if (x > xmax) xmax = x
              if (y < ymin) ymin = y; if (y > ymax) ymax = y
            }
          } else {
            var i = 0
            while (i < n.size()) { walkPositions(n.get(i)); i += 1 }
          }
        }
      def walkGeometry(g: JsonNode): Unit =
        if (g != null && g.isObject) {
          walkPositions(g.get("coordinates"))
          val coll = g.get("geometries")
          if (coll != null && coll.isArray) {
            var i = 0
            while (i < coll.size()) { walkGeometry(coll.get(i)); i += 1 }
          }
        }
      walkGeometry(node)
      if (xmin > xmax) null // no positions found: empty/invalid geometry
      else new GenericInternalRow(Array[Any](xmin, ymin, xmax, ymax))
    } catch { case _: Exception => null } // malformed JSON reads as null
  }
}

/** Shared evaluator for [[GeoContains]]: even-odd ray casting (PNPOLY)
  * over the raw GeoJSON — Polygon rings XOR (outer ring minus holes),
  * MultiPolygon = any part contains, GeometryCollection recurses;
  * non-areal types (Point/LineString) contain nothing. Boundary points
  * follow PNPOLY's half-open edge convention (consistent, not
  * symmetric — exact-boundary observations are the caller's modeling
  * decision, as in every planar geometry library). */
object GeoContainsHelper {
  private val mapper = new ObjectMapper()

  private def pnpolyRing(ring: JsonNode, x: Double, y: Double): Boolean = {
    var inside = false
    val n = ring.size()
    var i = 0
    var j = n - 1
    while (i < n) {
      val pi = ring.get(i); val pj = ring.get(j)
      if (pi.isArray && pj.isArray && pi.size() >= 2 && pj.size() >= 2) {
        val xi = pi.get(0).asDouble(); val yi = pi.get(1).asDouble()
        val xj = pj.get(0).asDouble(); val yj = pj.get(1).asDouble()
        if (((yi > y) != (yj > y)) &&
          (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  private def polygonContains(rings: JsonNode, x: Double, y: Double): Boolean = {
    // even-odd across all rings: outer ring in, holes flip back out
    var inside = false
    var i = 0
    while (i < rings.size()) {
      if (pnpolyRing(rings.get(i), x, y)) inside = !inside
      i += 1
    }
    inside
  }

  private def geometryContains(g: JsonNode, x: Double, y: Double): Boolean =
    if (g == null || !g.isObject) false
    else {
      val t = Option(g.get("type")).map(_.asText()).getOrElse("")
      val coords = g.get("coordinates")
      t match {
        case "Polygon" if coords != null && coords.isArray =>
          polygonContains(coords, x, y)
        case "MultiPolygon" if coords != null && coords.isArray =>
          (0 until coords.size()).exists(i => polygonContains(coords.get(i), x, y))
        case "GeometryCollection" =>
          val gs = g.get("geometries")
          gs != null && gs.isArray &&
            (0 until gs.size()).exists(i => geometryContains(gs.get(i), x, y))
        case _ => false
      }
    }

  /** Boxed Boolean so null (invalid JSON) survives the codegen seam. */
  def eval(json: UTF8String, x: Double, y: Double): java.lang.Boolean = {
    if (json == null) return null
    try java.lang.Boolean.valueOf(
      geometryContains(mapper.readTree(json.toString), x, y))
    catch { case _: Exception => null }
  }
}

/** `geo_contains(geometry_json, x, y)` → BOOLEAN — exact planar
  * point-in-polygon over the opaque GeoJSON column: the REFINE step on
  * top of `geo_envelope`'s grid-join prefilter (the standard two-phase
  * spatial join: cheap envelope candidates, exact predicate on the
  * survivors — q204 runs the full flow over the reference's own
  * forecast areas). Native expression; the ray cast runs in a static
  * helper the generated code calls directly. */
case class GeoContains(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == DoubleType &&
      third.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "geo_contains requires (STRING geojson, DOUBLE x, DOUBLE y), got " +
        s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString})")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "geo_contains"

  override def nullSafeEval(g: Any, x: Any, y: Any): Any = {
    val r = GeoContainsHelper.eval(g.asInstanceOf[UTF8String],
      x.asInstanceOf[Double], y.asInstanceOf[Double])
    if (r == null) null else r.booleanValue()
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, x, y) => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Boolean $boxed = graft.functions.GeoContainsHelper.eval($g, $x, $y);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.booleanValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): GeoContains = copy(first = f, second = s, third = t)
}

/** `geo_envelope(geometry_json)` → `struct<xmin, ymin, xmax, ymax>` —
  * the map-side envelope extraction that turns the reference's opaque
  * GeoJSON column (task.ts:14 `Type.Any`, kept as a raw string for
  * ragged-coordinate fidelity) into a joinable bounding box: feed the
  * result to the q202 grid-binned bbox join and "which forecast area
  * covers this observation" is a plain equi hash join at any scale.
  * Native expression (not a UDF): the parse happens once per row in a
  * static helper the generated code calls directly, keeping the scan
  * inside whole-stage codegen. */
case class GeoEnvelope(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geo_envelope requires a STRING (GeoJSON) argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = GeoEnvelope.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "geo_envelope"

  override def nullSafeEval(g: Any): Any =
    GeoEnvelopeHelper.eval(g.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rowType = CodeGenerator.javaType(dataType)
      s"""
         |${ev.value} = ($rowType) graft.functions.GeoEnvelopeHelper.eval($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GeoEnvelope =
    copy(child = newChild)
}

object GeoEnvelope {
  val Schema: StructType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))
}

object GeoFunctions {
  val envelopeInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("geo_envelope"),
    new ExpressionInfo(classOf[GeoEnvelope].getName, "geo_envelope"),
    (args: Seq[Expression]) => GeoEnvelope(args.head))

  val containsInfo: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("geo_contains"),
    new ExpressionInfo(classOf[GeoContains].getName, "geo_contains"),
    (args: Seq[Expression]) => GeoContains(args(0), args(1), args(2)))

  /** Idempotently register the geo functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("geo_envelope", envelopeInfo._3, "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("geo_contains", containsInfo._3, "scala_udf")
  }

  def envelope(g: Column): Column = call_function("geo_envelope", g)
  def contains(g: Column, x: Column, y: Column): Column =
    call_function("geo_contains", g, x, y)
}
