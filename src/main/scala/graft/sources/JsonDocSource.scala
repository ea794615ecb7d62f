package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** Custom DataSource V2 batch source: JSON-lines documents fetched from an
  * "endpoint" (a directory of response bodies), with **source-side filter
  * pushdown** and **column pruning** — the Spark-native generalization of
  * the reference's HTTP source scans whose predicates are encoded into the
  * request (reference `task.ts:89,102`: `includeExpired=false`,
  * `datetime=…`, `productType=avalancheforecast` in the URL; SURVEY.md
  * §2A-1/2/3).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-jsondoc").schema(s).option("path", dir).load()
  * }}}
  *
  * What is real here (and shows in `.explain`):
  *  - `SupportsPushDownFilters`: Eq/Gt/Ge/Lt/Le/IsNotNull on top-level
  *    fields are accepted, evaluated inside the partition reader before a
  *    row is ever materialized to Spark, and reported via `pushedFilters`.
  *  - `SupportsPushDownRequiredColumns`: only requested fields are parsed
  *    into the output row.
  *  - One `InputPartition` per response file → parallel scan.
  *
  * Scale note: file listing uses the local filesystem for this offline
  * build; a production deployment would swap the listing/open calls for
  * the Hadoop `FileSystem` API (S3/HDFS) or an HTTP pagination protocol —
  * the planning/pushdown machinery is unchanged.
  */
class JsonDocSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsondoc"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-jsondoc requires an explicit schema: spark.read.format(\"graft-jsondoc\").schema(...)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // The reader parses only these primitive types and the pushdown
    // comparator only evaluates them; any other declared type would
    // silently corrupt rows (UTF8String in a non-string column) or drop
    // all matches — reject at table creation instead.
    val bad = schema.fields.filterNot(f => JsonDocSource.supportedType(f.dataType))
    require(bad.isEmpty,
      "graft-jsondoc supports long/int/double/boolean/string fields only; unsupported: " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    new JsonDocTable(schema, properties.get("path"))
  }
}

private[sources] object JsonDocSource {
  def supportedType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | BooleanType | StringType => true
    case _ => false
  }
}

private[sources] class JsonDocTable(schema: StructType, path: String)
    extends Table with SupportsRead {
  require(path != null, "graft-jsondoc requires option(\"path\", ...)")
  override def name(): String = s"graft-jsondoc($path)"
  override def schema(): StructType = schema0
  private val schema0 = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonDocScanBuilder(schema0, path)
}

private[sources] class JsonDocScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Accept the filter shapes an HTTP endpoint could encode as query
    * params; everything else stays in Spark (returned as residual). A
    * filter is only ours when the field exists AND its declared type is
    * one the reader's comparator evaluates — a pushed-but-unevaluable
    * filter would silently drop every row, because Spark trusts the
    * residual and never re-checks. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def evaluable(a: String): Boolean =
      fullSchema.fields.exists(f => f.name == a && JsonDocSource.supportedType(f.dataType))
    val (ours, residual) = filters.partition {
      case EqualTo(a, _) => evaluable(a)
      case GreaterThan(a, _) => evaluable(a)
      case GreaterThanOrEqual(a, _) => evaluable(a)
      case LessThan(a, _) => evaluable(a)
      case LessThanOrEqual(a, _) => evaluable(a)
      case IsNotNull(a) => evaluable(a)
      case _ => false
    }
    pushed = ours
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new JsonDocScan(required, path, pushed)
}

private[sources] class JsonDocScan(readSchema0: StructType, path: String,
    filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = readSchema0
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = new java.io.File(path).listFiles()
    if (files == null) Array.empty
    else files.filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
      .map(f => JsonDocPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonDocReaderFactory(readSchema0, filters)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JsonDocMicroBatchStream(readSchema0, path, filters)

  override def description(): String =
    s"graft-jsondoc path=$path pushed=[${filters.mkString(", ")}]"
}

/** Streaming form of the same source (SURVEY.md §2B scans row:
  * "TableProvider + MicroBatchStream"): the endpoint directory is an
  * append-only log of response bodies — each poll that finds new files
  * turns exactly those files into the next micro-batch. The offset is a
  * HIGH-WATERMARK FILE NAME — the lexicographically greatest name already
  * consumed ("" = nothing consumed); writers append with names sorting
  * after earlier batches, and a batch is exactly the files with
  * watermark < name <= end. Identifying consumed files by NAME (not by
  * position in the current listing, as a file-count offset would) means
  * deleting or renaming an already-consumed file can never shift which
  * files replay after a restart: replay is driven by the committed name
  * alone. Pushdown/pruning from the shared ScanBuilder applies to every
  * micro-batch identically to the batch path. */
private[sources] case class FileNameOffset(name: String) extends Offset {
  override def json(): String = name
}

private[sources] class JsonDocMicroBatchStream(readSchema: StructType,
    path: String, filters: Array[Filter]) extends MicroBatchStream {

  private def files(): Array[java.io.File] = {
    val fs = new java.io.File(path).listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
  }

  /** The watermark must never regress: if the greatest-named file is
    * deleted while earlier consumed files remain, a fresh listing's max
    * would move backwards and re-admit those earlier names. */
  private var hwm: String = ""

  /** Names seen in any previous listing of THIS instance; null until the
    * first listing (whose below-watermark files are presumed consumed —
    * the normal restart picture — and seeded silently). A name that
    * first APPEARS at or below the watermark on a later listing violates
    * the append-in-name-order contract (slow concurrent writer,
    * non-zero-padded numeric names like b10 < b9) and would otherwise be
    * skipped with zero observability — the one failure the offset
    * semantics can't make safe, so at least make it loud. */
  private var known: Set[String] = null

  /** Names this instance actually handed to a batch. A file can land
    * between latestOffset() and planInputPartitions() and still make the
    * in-flight batch (planning re-lists the directory) — such a file is
    * consumed, not lost, and must not be warned about. */
  private var planned: Set[String] = Set.empty

  override def initialOffset(): Offset = FileNameOffset("")
  override def latestOffset(): Offset = {
    val fs = files()
    val names = fs.map(_.getName)
    if (known != null) {
      val late = names.filter(n => !known.contains(n) && !planned.contains(n) && n <= hwm)
      if (late.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(classOf[JsonDocMicroBatchStream]).warn(
          s"graft-jsondoc: ${late.length} file(s) appeared at-or-below the watermark " +
            s"'$hwm' without being planned into any batch and will never be ingested " +
            s"(append-in-name-order contract violated): ${late.take(5).mkString(", ")}")
    }
    known = (if (known == null) Set.empty[String] else known) ++ names
    if (fs.nonEmpty && fs.last.getName > hwm) hwm = fs.last.getName
    FileNameOffset(hwm)
  }
  /** Recovery seeds the in-instance watermark: a fresh instance whose
    * greatest-named consumed file was deleted would otherwise report a
    * listing max BELOW the committed offset from `latestOffset`, and the
    * regressed name would be committed back to the checkpoint. */
  override def deserializeOffset(json: String): Offset = {
    if (json > hwm) hwm = json
    FileNameOffset(json)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FileNameOffset].name
    val e = end.asInstanceOf[FileNameOffset].name
    val chosen = files().filter(f => f.getName > s && f.getName <= e)
    planned ++= chosen.map(_.getName)
    chosen.map(f => JsonDocPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonDocReaderFactory(readSchema, filters)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class JsonDocPartition(file: String) extends InputPartition

private[sources] class JsonDocReaderFactory(readSchema: StructType,
    filters: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonDocReader(partition.asInstanceOf[JsonDocPartition].file, readSchema, filters)
}

/** Streams one response file line-by-line; applies pushed filters on the
  * parsed JSON BEFORE building an InternalRow (source-side evaluation). */
private[sources] class JsonDocReader(file: String, readSchema: StructType,
    filters: Array[Filter]) extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines().filter(_.nonEmpty)
  private var current: InternalRow = _

  private def fieldValue(node: JsonNode, name: String): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else readSchema.find(_.name == name).map(_.dataType) match {
      case Some(LongType) => v.asLong()
      case Some(IntegerType) => v.asInt()
      case Some(DoubleType) => v.asDouble()
      case Some(BooleanType) => v.asBoolean()
      case _ => v.asText()
    }
  }

  /** Raw (schema-independent) comparable value for filter columns — may
    * not be in the pruned read schema. */
  private def rawValue(node: JsonNode, name: String): Any = {
    val v = node.get(name)
    if (v == null || v.isNull) null
    else if (v.isIntegralNumber) v.asLong()
    else if (v.isNumber) v.asDouble()
    else if (v.isBoolean) v.asBoolean()
    else v.asText()
  }

  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null) => None
    // Integral JSON token vs integral constant: exact long compare.
    // Fractional constant (e.g. x = 5.7 against token 5): longValue()
    // would truncate 5.7 → 5 and wrongly match — compare as exact
    // BigDecimals instead (also precision-safe for longs beyond 2^53).
    case (x: Long, y: java.lang.Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: java.lang.Integer) => Some(java.lang.Long.compare(x, y.longValue()))
    case (x: Long, y: java.lang.Short) => Some(java.lang.Long.compare(x, y.longValue()))
    case (x: Long, y: java.lang.Byte) => Some(java.lang.Long.compare(x, y.longValue()))
    case (x: Long, y: Number) =>
      val yd = y.doubleValue()
      if (yd.isNaN || yd.isInfinite) Some(java.lang.Double.compare(x.toDouble, yd))
      else Some(java.math.BigDecimal.valueOf(x).compareTo(new java.math.BigDecimal(y.toString)))
    case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue()))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  private def passes(node: JsonNode): Boolean = filters.forall {
    case EqualTo(a, v) => cmp(rawValue(node, a), v).contains(0)
    case GreaterThan(a, v) => cmp(rawValue(node, a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(rawValue(node, a), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(rawValue(node, a), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(rawValue(node, a), v).exists(_ <= 0)
    case IsNotNull(a) => rawValue(node, a) != null
    case _ => true
  }

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val node = mapper.readTree(it.next())
      if (passes(node)) {
        val values = readSchema.fields.map { f =>
          fieldValue(node, f.name) match {
            case s: String => UTF8String.fromString(s)
            case other => other
          }
        }
        current = InternalRow.fromSeq(values.toSeq)
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
