package graft.sources

import java.util
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
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
  *  - `SupportsPushDownAggregates` (r12, partial mode): global
  *    COUNT(*)/COUNT(col)/MIN/MAX fold scan-side into ONE row per
  *    response file, merged by Spark's final aggregate — the
  *    count-the-matches call an HTTP endpoint would answer without
  *    shipping bodies. Group-bys and order-dependent aggregates are
  *    refused (stay in Spark).
  *  - `SupportsPushDownLimit` (r12, partial): `limit(n)` stops each
  *    file's reader after n surviving rows — later lines never parse.
  *  - `SupportsReportStatistics` (r12): the scan reports its on-disk
  *    bytes, so a small response directory broadcast-joins like a small
  *    parquet dimension instead of defaulting to "unknown = never
  *    broadcast".
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

/** The aggregate shapes the source computes scan-side (SURVEY §2B
  * scans/sources row, r12 extension): one partial row per response
  * file, merged by Spark's final aggregate — COUNT(*)/COUNT(col) as
  * partial counts (finalized by SUM), MIN/MAX carried as the column's
  * declared type. Order-independent functions only, so partial-per-file
  * merge is exact; AVG/SUM-over-double are left to Spark (fold order
  * would change bits). */
private[sources] sealed trait JsonAggSpec { def name: String }
private[sources] case object JsonCountStar extends JsonAggSpec { def name = "COUNT(*)" }
private[sources] final case class JsonCountCol(col: String, dt: DataType) extends JsonAggSpec {
  def name = s"COUNT($col)"
}
private[sources] final case class JsonMinCol(col: String, dt: DataType) extends JsonAggSpec {
  def name = s"MIN($col)"
}
private[sources] final case class JsonMaxCol(col: String, dt: DataType) extends JsonAggSpec {
  def name = s"MAX($col)"
}

private[sources] class JsonDocScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var aggSpecs: Seq[JsonAggSpec] = Nil
  private var aggSchema: StructType = _
  private var limit: Option[Int] = None

  /** PARTIAL limit pushdown (`isPartiallyPushed` stays true): each
    * partition reader stops parsing its file after `n` rows survive the
    * pushed filters — Spark keeps the global LIMIT on top, so
    * `df.limit(10)` reads at most 10 lines per response file instead of
    * every line of every file. Never co-planned with a pushed aggregate
    * (a LIMIT above an Aggregate does not reach the scan). */
  override def pushLimit(n: Int): Boolean = {
    if (n >= 0) limit = Some(n)
    limit.isDefined
  }

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

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` stays false):
    * accept only global (no GROUP BY) combinations of COUNT(*) /
    * COUNT(col) / MIN(col) / MAX(col) over declared supported-type
    * top-level fields. Spark guarantees it only attempts this when every
    * filter was pushed (a residual filter could not run over partial
    * rows), and merges one partial row per InputPartition with a final
    * aggregate — counts are summed, so per-file partials are exact. */
  override def pushAggregation(aggregation: aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (aggregation.groupByExpressions.nonEmpty) return false
    def topField(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 =>
          fullSchema.fields.find(f => f.name == nr.fieldNames.head &&
            JsonDocSource.supportedType(f.dataType))
        case _ => None
      }
    val specs = aggregation.aggregateExpressions.toSeq.map {
      case _: aggregate.CountStar => Some(JsonCountStar)
      case c: aggregate.Count if !c.isDistinct =>
        topField(c.column).map(f => JsonCountCol(f.name, f.dataType))
      case m: aggregate.Min => topField(m.column).map(f => JsonMinCol(f.name, f.dataType))
      case m: aggregate.Max => topField(m.column).map(f => JsonMaxCol(f.name, f.dataType))
      case _ => None
    }
    if (specs.isEmpty || specs.exists(_.isEmpty)) return false
    aggSpecs = specs.flatten
    aggSchema = StructType(aggSpecs.zipWithIndex.map {
      case (JsonCountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (JsonCountCol(_, _), i) => StructField(s"agg_$i", LongType, nullable = false)
      case (JsonMinCol(_, dt), i) => StructField(s"agg_$i", dt, nullable = true)
      case (JsonMaxCol(_, dt), i) => StructField(s"agg_$i", dt, nullable = true)
    })
    true
  }

  override def build(): Scan =
    if (aggSpecs.nonEmpty) new JsonDocAggScan(aggSchema, path, pushed, aggSpecs)
    else new JsonDocScan(required, path, pushed, limit)
}

private[sources] class JsonDocScan(readSchema0: StructType, path: String,
    filters: Array[Filter], limit: Option[Int] = None)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = readSchema0
  override def toBatch: Batch = this

  private def listFiles(): Array[java.io.File] = {
    val files = new java.io.File(path).listFiles()
    if (files == null) Array.empty
    else files.filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
  }

  override def planInputPartitions(): Array[InputPartition] =
    listFiles().map(f => JsonDocPartition(f.getAbsolutePath): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonDocReaderFactory(readSchema0, filters, limit)

  /** Source-reported size (`SupportsReportStatistics`): the bytes on
    * disk. Without this a DSv2 scan defaults to "unknown = huge" and a
    * join against it can never broadcast — with it, a small response
    * directory joins as the build side of a BroadcastHashJoin exactly
    * like a small parquet dimension would (SourceSinkSpec pins the plan
    * shape). numRows stays empty: lines are not counted without
    * reading, and a wrong row estimate is worse than none. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = listFiles().map(_.length()).sum
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new JsonDocMicroBatchStream(readSchema0, path, filters)

  override def description(): String =
    s"graft-jsondoc path=$path pushed=[${filters.mkString(", ")}]" +
      limit.map(n => s" PushedLimit=$n").getOrElse("")
}

/** Scan-side aggregation: same file partitions, but each reader emits
  * exactly ONE partial row (counts + typed min/max) computed while
  * streaming the file — the rows themselves are never materialized to
  * Spark. Pushed filters still apply line-by-line first, so
  * `SELECT count(*) ... WHERE lang = 'en'` ships two longs per file
  * instead of every matching row. */
private[sources] class JsonDocAggScan(aggSchema: StructType, path: String,
    filters: Array[Filter], specs: Seq[JsonAggSpec]) extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val files = new java.io.File(path).listFiles()
    if (files == null) Array.empty
    else files.filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
      .map(f => JsonDocPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonDocAggReaderFactory(aggSchema, filters, specs)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    throw new IllegalStateException(
      "graft-jsondoc: aggregate pushdown is a batch-only plan shape (Spark does not " +
        "push aggregates into streaming scans); this call indicates a planner bug")

  override def description(): String =
    s"graft-jsondoc path=$path pushed=[${filters.mkString(", ")}] " +
      s"PushedAggregates=[${specs.map(_.name).mkString(", ")}]"
}

private[sources] class JsonDocAggReaderFactory(aggSchema: StructType,
    filters: Array[Filter], specs: Seq[JsonAggSpec]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonDocAggReader(partition.asInstanceOf[JsonDocPartition].file,
      aggSchema, filters, specs)
}

/** Folds one response file into a single partial-aggregate row. Min/max
  * accumulate in Spark's INTERNAL representation (UTF8String for
  * strings) and compare with the same ordering Spark's final min/max
  * uses, so partial-then-final equals whole-set aggregation exactly;
  * an empty (or fully filtered) file contributes count 0 and null
  * min/max, which the final aggregate ignores. */
private[sources] class JsonDocAggReader(file: String, aggSchema: StructType,
    filters: Array[Filter], specs: Seq[JsonAggSpec])
    extends PartitionReader[InternalRow] {

  // every column any spec touches, once, with its declared type
  private val readSchema: StructType = StructType(
    specs.collect {
      case JsonCountCol(c, dt) => (c, dt)
      case JsonMinCol(c, dt) => (c, dt)
      case JsonMaxCol(c, dt) => (c, dt)
    }.distinctBy(_._1).map { case (c, dt) => StructField(c, dt) })

  private val rowReader = new JsonDocReader(file, readSchema, filters)

  private var done = false
  private var result: InternalRow = _

  private def cmpInternal(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => java.lang.Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case _ => throw new IllegalStateException(s"unorderable agg values: $a / $b")
  }

  override def next(): Boolean = {
    if (done) return false
    val colIdx = readSchema.fieldNames.zipWithIndex.toMap
    val counts = new Array[Long](specs.size)
    val minmax = new Array[Any](specs.size)
    while (rowReader.next()) {
      val row = rowReader.get()
      var i = 0
      while (i < specs.size) {
        specs(i) match {
          case JsonCountStar => counts(i) += 1L
          case JsonCountCol(c, _) =>
            if (!row.isNullAt(colIdx(c))) counts(i) += 1L
          case JsonMinCol(c, dt) =>
            val v = if (row.isNullAt(colIdx(c))) null else row.get(colIdx(c), dt)
            if (v != null && (minmax(i) == null || cmpInternal(v, minmax(i)) < 0)) minmax(i) = v
          case JsonMaxCol(c, dt) =>
            val v = if (row.isNullAt(colIdx(c))) null else row.get(colIdx(c), dt)
            if (v != null && (minmax(i) == null || cmpInternal(v, minmax(i)) > 0)) minmax(i) = v
        }
        i += 1
      }
    }
    result = InternalRow.fromSeq(specs.zipWithIndex.map {
      case (JsonCountStar, i) => counts(i)
      case (JsonCountCol(_, _), i) => counts(i)
      case (_, i) => minmax(i)
    })
    done = true
    true
  }

  override def get(): InternalRow = result
  override def close(): Unit = rowReader.close()
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
    filters: Array[Filter], limit: Option[Int] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new JsonDocReader(partition.asInstanceOf[JsonDocPartition].file, readSchema,
      filters, limit)
}

/** Streams one response file line-by-line; applies pushed filters on the
  * parsed JSON BEFORE building an InternalRow (source-side evaluation).
  * A pushed partial limit stops the scan after that many rows SURVIVE
  * the filters — later lines are never parsed. */
private[sources] class JsonDocReader(file: String, readSchema: StructType,
    filters: Array[Filter], limit: Option[Int] = None)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val lines = scala.io.Source.fromFile(file, "UTF-8")
  private val it = lines.getLines().filter(_.nonEmpty)
  private var current: InternalRow = _
  private var emitted = 0

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
    if (limit.exists(emitted >= _)) return false
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
        emitted += 1
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}
