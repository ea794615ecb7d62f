package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructType}

/** VARIANT/JSON SHREDDING AT WRITE (r16 — the Spark 4 / Parquet
  * variant-shredding direction, jsondoc form). A table declares
  *
  *   TBLPROPERTIES ('write.shred.columns' = 'k_shred=props:$.k[, ...]')
  *
  * and every writer MATERIALIZES column `k_shred` from the raw JSON
  * string column `props` (top-level field `k`) as the row lands — a
  * GENERATED-ALWAYS column: whatever the incoming row carried for the
  * target is replaced by the extraction, so the subcolumn can never
  * drift from its source. Repeated typed access then reads a PLAIN
  * COLUMN: no `parse_json`/`variant_get`/`get_json_object` per row at
  * read, and the stats sidecar, Bloom filters, and pushed filters all
  * work on the shredded value like any other column (the raw string
  * stays beside it as the fidelity representation, exactly like the
  * shredded-variant encodings keep the untyped tail).
  *
  * Extraction is typed-strict (a lying subcolumn is worse than a null
  * one): LONG/INT targets take integral tokens only, DOUBLE any numeric
  * token, STRING textual tokens only; a missing field, JSON null, or
  * shape mismatch lands SQL NULL. Paths are top-level `$.field` — the
  * flat-JSON contract of the source itself.
  *
  * Known seam: CHECK constraints evaluate against the INCOMING row
  * (they wrap the writer), so a constraint on a shred TARGET sees the
  * pre-replacement value (usually NULL, which CHECK passes per SQL),
  * not the materialized extraction — declare the constraint on the
  * SOURCE column's content instead. */
private[sources] object JsonDocShred {
  val PropKey = "write.shred.columns"

  /** One declaration: materialize `target` from `src`'s field `field`. */
  final case class Spec(target: String, src: String, field: String)

  def parse(decl: String): Seq[Spec] =
    decl.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { one =>
      val eq = one.indexOf('=')
      val colon = one.indexOf(':', math.max(eq, 0))
      require(eq > 0 && colon > eq,
        s"graft catalog: $PropKey entries are '<target>=<srccol>:$$.<field>', got '$one'")
      val path = one.substring(colon + 1).trim
      require(path.startsWith("$.") && path.length > 2 && !path.substring(2).contains('.'),
        s"graft catalog: shred paths are top-level '$$.<field>' only, got '$path'")
      Spec(one.substring(0, eq).trim, one.substring(eq + 1, colon).trim,
        path.substring(2))
    }

  /** DDL-time validation: targets exist with a supported type, sources
    * exist as strings, no self-shred, no duplicate targets. */
  def validateDecl(decl: String, schema: StructType): Unit = {
    val specs = parse(decl)
    require(specs.map(_.target).distinct.size == specs.size,
      s"graft catalog: duplicate shred targets in '$decl'")
    specs.foreach { s =>
      val t = schema.fields.find(_.name == s.target).getOrElse(
        throw new IllegalArgumentException(
          s"graft catalog: $PropKey target '${s.target}' is not a column"))
      require(supportedTarget(t.dataType),
        s"graft catalog: shred target '${s.target}' has type " +
          s"${t.dataType.simpleString} — long/int/double/string only")
      val src = schema.fields.find(_.name == s.src).getOrElse(
        throw new IllegalArgumentException(
          s"graft catalog: $PropKey source '${s.src}' is not a column"))
      require(src.dataType == StringType,
        s"graft catalog: shred source '${s.src}' must be a STRING (raw JSON) " +
          s"column, got ${src.dataType.simpleString}")
      require(s.target != s.src,
        s"graft catalog: shred target and source must differ: '${s.target}'")
    }
  }

  def supportedTarget(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType => true
    case _ => false
  }

  /** The table's declared specs (un-ordinal'd; writers bind against
    * their own write schema). Unknown/mistyped declarations degrade to
    * none here — the DDL validation is where they refuse loudly. */
  def declared(path: String): Seq[Spec] =
    GraftCatalog.tablePropsOf(path).get(PropKey).toSeq.flatMap { d =>
      try parse(d) catch { case _: Exception => Seq.empty }
    }

  /** Typed-strict extraction of `field` from a parsed source node. */
  def extract(srcNode: JsonNode, field: String, dt: DataType): Any = {
    if (srcNode == null) return null
    val v = srcNode.get(field)
    if (v == null || v.isNull) return null
    dt match {
      case LongType => if (v.isIntegralNumber) java.lang.Long.valueOf(v.asLong()) else null
      case IntegerType =>
        if (v.isIntegralNumber && v.canConvertToInt) java.lang.Long.valueOf(v.asLong())
        else null
      case DoubleType => if (v.isNumber) java.lang.Double.valueOf(v.asDouble()) else null
      case StringType => if (v.isTextual) v.asText() else null
      case _ => null
    }
  }
}
