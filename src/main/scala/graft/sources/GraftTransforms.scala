package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PARTITION TRANSFORMS (r14, the r13 verdict's item 2): the value →
  * directory-component functions behind `PARTITIONED BY (days(ts))` and
  * `PARTITIONED BY (bucket(n, col))`, in ONE place so the writer's
  * routing, the planner's pruning, and the clustered-write distribution
  * (via the [[GraftCatalog]] FunctionCatalog) can never disagree:
  *
  *  - `days`: an ISO-8601 STRING column maps to its first 10 chars
  *    (`"2024-01-15T07:..."` → `"2024-01-15"`); a LONG column is epoch
  *    MILLIS and maps to its UTC date. Time-partitioned ingest — the
  *    single most common lakehouse layout — gets one directory per day
  *    instead of one per distinct timestamp (identity's failure mode).
  *  - `bucket(n)`: `floorMod(hash, n)` with the hash fixed forever as
  *    JLS `String.hashCode` for strings / `Long.hashCode` for integral
  *    values — deterministic across JVMs, so directory routing is
  *    stable and a point filter prunes to exactly one bucket.
  *
  * Directory names are `<col>_day=<v>` / `<col>_bucket=<v>` (identity
  * keeps bare `<col>=<v>`), so a transform can never collide with an
  * identity layout on the same column. */
private[sources] object GraftTransforms {

  /** Epoch millis → UTC ISO date. floorDiv keeps pre-1970 correct. */
  def dayOfMillis(ms: Long): String =
    java.time.LocalDate.ofEpochDay(java.lang.Math.floorDiv(ms, 86400000L)).toString

  /** ISO-8601 string → its date prefix; anything shorter than 10 chars
    * cannot name a day and is refused loudly (a silent substring would
    * scatter rows into garbage directories). */
  def dayOfString(s: String): String = {
    require(s.length >= 10,
      s"graft-jsondoc: days() partition value '$s' is not an ISO-8601 date/timestamp")
    s.substring(0, 10)
  }

  /** The ISO prefix length of each time grain — hours/months/years
    * (r14) share days()'s machinery end to end because every grain is a
    * PREFIX of the ISO-8601 rendering, and ISO prefixes preserve order
    * (the monotonicity the range pruning rests on). "2024-01-15T07" /
    * "2024-01" / "2024". */
  private[sources] val TimePrefixLen: Map[String, Int] =
    Map("years" -> 4, "months" -> 7, "days" -> 10, "hours" -> 13)

  /** Epoch millis → the UTC ISO prefix of `transform`'s grain. */
  def timeOfMillis(transform: String, ms: Long): String = transform match {
    case "days" => dayOfMillis(ms)
    case "hours" =>
      val h = java.lang.Math.floorMod(java.lang.Math.floorDiv(ms, 3600000L), 24L)
      f"${dayOfMillis(ms)}T$h%02d"
    case "months" => dayOfMillis(ms).substring(0, 7)
    case "years" => dayOfMillis(ms).substring(0, 4)
  }

  /** ISO-8601 string → the prefix of `transform`'s grain; too short to
    * name the grain is refused loudly. */
  def timeOfString(transform: String, s: String): String = {
    val n = TimePrefixLen(transform)
    require(s.length >= n,
      s"graft-jsondoc: $transform() partition value '$s' is not an ISO-8601 " +
        "date/timestamp of that grain")
    s.substring(0, n)
  }

  /** `truncate(w)` (r14, the last of Iceberg's transform family):
    * strings keep their first `w` chars (shorter strings stay whole),
    * integral values floor to the nearest multiple of `w`
    * (`v - floorMod(v, w)`, correct for negatives). Monotone in its
    * source — ranges prune — and order-preserving WITHIN the source
    * type, so numeric directories compare numerically, never as text. */
  def truncOf(v: Any, w: Int): Any = v match {
    case s: String => if (s.length <= w) s else s.substring(0, w)
    case l: Long => l - java.lang.Math.floorMod(l, w.toLong)
    case i: Int => (i.toLong - java.lang.Math.floorMod(i.toLong, w.toLong)).toInt
    case other => throw new IllegalArgumentException(
      s"graft-jsondoc: truncate() over ${other.getClass.getSimpleName} is not supported")
  }

  def bucketOf(v: Any, n: Int): Int = v match {
    case l: Long => java.lang.Math.floorMod(java.lang.Long.hashCode(l), n)
    case i: Int => java.lang.Math.floorMod(java.lang.Long.hashCode(i.toLong), n)
    case s: String => java.lang.Math.floorMod(s.hashCode, n)
    case other => throw new IllegalArgumentException(
      s"graft-jsondoc: bucket() over ${other.getClass.getSimpleName} is not supported")
  }

  /** The directory VALUE of one row's partition source value under a
    * spec (identity passes through; the encoder escapes it). */
  def dirValue(spec: GraftCatalog.PartField, raw: Any): Any = spec.transform match {
    case "identity" => raw
    case t if TimePrefixLen.contains(t) => raw match {
      case l: Long => timeOfMillis(t, l)
      case s: String => timeOfString(t, s)
      case other => throw new IllegalArgumentException(
        s"graft-jsondoc: $t() over ${other.getClass.getSimpleName} is not supported")
    }
    case "bucket" => bucketOf(raw, spec.buckets)
    case "truncate" => truncOf(raw, spec.buckets) // `buckets` doubles as width
  }

  /** FunctionCatalog surface: Spark resolves the clustered-write
    * distribution's `days(col)` / `bucket(n, col)` transforms through
    * the table's catalog, and the bound functions below compute EXACTLY
    * the writer's directory value — so the required distribution
    * co-locates precisely one output directory per task. */
  def loadFunction(name: String): UnboundFunction = name match {
    case t if TimePrefixLen.contains(t) => new TimeUnbound(t)
    case "bucket" => BucketUnbound
    case "truncate" => TruncateUnbound
    case other => throw new NoSuchElementException(
      s"graft catalog has no function '$other' (available: years, months, days, " +
        "hours, bucket, truncate)")
  }

  private class TimeUnbound(transform: String) extends UnboundFunction {
    override def name(): String = transform
    override def description(): String =
      s"UTC $transform grain of an ISO-8601 string or epoch-millis long"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$transform() takes one argument, got ${inputType.fields.length}")
      inputType.fields(0).dataType match {
        case StringType => new TimeOfStringFn(transform)
        case LongType => new TimeOfLongFn(transform)
        case other => throw new UnsupportedOperationException(
          s"$transform() over ${other.simpleString} is not supported (string or bigint)")
      }
    }
  }

  private class TimeOfStringFn(transform: String) extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = StringType
    override def name(): String = transform
    override def canonicalName(): String = s"graft.$transform.string"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): UTF8String =
      if (input.isNullAt(0)) null
      else UTF8String.fromString(timeOfString(transform, input.getUTF8String(0).toString))
  }

  private class TimeOfLongFn(transform: String) extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = StringType
    override def name(): String = transform
    override def canonicalName(): String = s"graft.$transform.long"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): UTF8String =
      if (input.isNullAt(0)) null
      else UTF8String.fromString(timeOfMillis(transform, input.getLong(0)))
  }

  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String = "stable hash bucket id (JLS hashCode, floorMod n)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket() takes (n, col), got ${inputType.fields.length} arguments")
      // one bound function per source type, each with EXACT inputTypes —
      // an implicit cast (long rendered as a string, say) would hash
      // differently than the writer's routing and scatter a bucket
      // directory across tasks
      inputType.fields(1).dataType match {
        case LongType => BucketLongFn
        case IntegerType => BucketIntFn
        case StringType => BucketStringFn
        case other => throw new UnsupportedOperationException(
          s"bucket() over ${other.simpleString} is not supported (bigint/int/string)")
      }
    }
  }

  private abstract class BucketBase extends ScalarFunction[Integer] {
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def isResultNullable: Boolean = true
  }

  private object BucketLongFn extends BucketBase {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def canonicalName(): String = "graft.bucket.long"
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(1)) null
      else Int.box(bucketOf(input.getLong(1), input.getInt(0)))
  }

  private object BucketIntFn extends BucketBase {
    override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
    override def canonicalName(): String = "graft.bucket.int"
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(1)) null
      else Int.box(bucketOf(input.getInt(1), input.getInt(0)))
  }

  private object BucketStringFn extends BucketBase {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def canonicalName(): String = "graft.bucket.string"
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(1)) null
      else Int.box(bucketOf(input.getUTF8String(1).toString, input.getInt(0)))
  }

  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "string prefix / integral floor-to-multiple of width w (order-preserving)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate() takes (w, col), got ${inputType.fields.length} arguments")
      inputType.fields(1).dataType match {
        case StringType => TruncStringFn
        case LongType => TruncLongFn
        case IntegerType => TruncIntFn
        case other => throw new UnsupportedOperationException(
          s"truncate() over ${other.simpleString} is not supported (string/bigint/int)")
      }
    }
  }

  private object TruncStringFn extends ScalarFunction[UTF8String] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = StringType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate.string"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): UTF8String =
      if (input.isNullAt(1)) null
      else UTF8String.fromString(
        truncOf(input.getUTF8String(1).toString, input.getInt(0)).asInstanceOf[String])
  }

  private object TruncLongFn extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate.long"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(1)) null
      else Long.box(truncOf(input.getLong(1), input.getInt(0)).asInstanceOf[Long])
  }

  private object TruncIntFn extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "truncate"
    override def canonicalName(): String = "graft.truncate.int"
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(1)) null
      else Int.box(truncOf(input.getInt(1), input.getInt(0)).asInstanceOf[Int])
  }
}
