package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}

import scala.jdk.CollectionConverters._

/** PER-FILE BLOOM FILTERS for point-lookup file skipping (r16 — the r15
  * verdict's top item). The min/max stats sidecar prunes range and
  * clustered predicates, but an equality probe on a HIGH-CARDINALITY,
  * UNCLUSTERED key (DELETE-by-id, GDPR erasure, a CDC key probe) finds
  * every file's [min,max] straddling the key and scans the whole table.
  * Iceberg and Delta ship per-file Bloom filters for exactly this shape;
  * this is the jsondoc form:
  *
  *   - OPT-IN via `TBLPROPERTIES ('write.bloom.columns' = 'k[,..]')` —
  *     long/int/string columns only (the key shapes; doubles have
  *     -0.0/NaN equality edge cases and booleans can't select).
  *   - WRITERS accumulate a 64-bit hash per non-null value of each
  *     declared column and build one Bloom per (file, column) at task
  *     commit: m = next power of two >= 10 bits/value (k = 7 probes,
  *     ~1% false positives), shipped to the driver inside the ordinary
  *     commit message and folded into the `_bloom.json` sidecar beside
  *     `_stats.json` — a SEPARATE sidecar, so the every-query stats load
  *     never pays for bloom bytes; the bloom sidecar is read only when
  *     an equality/In predicate targets an indexed column.
  *   - PLANNING consults the filter wherever the stats pruner runs (the
  *     row scan's static and runtime passes, the aggregate scan): a file
  *     whose bloom provably excludes every key of a conjunct never
  *     becomes a partition. Runtime `In` filters are how MERGE/DELETE
  *     group filtering and DPP deliver their keys, so row-level point
  *     operations skip non-matching files through the same gate.
  *   - Every gap keeps the file: no sidecar, no entry (legacy/optimized
  *     files), un-hashable constant, oversized key set — Bloom answers
  *     are only ever "definitely absent", so pruning is sound and
  *     deletes/updates on top (DVs, eq-deletes) only make the filter a
  *     SUPERSET of the live values.
  *   - OPTIMIZE rebuilds merged files' entries by FOLD-UNION: all
  *     blooms are power-of-two sized with a shared k, and folding a
  *     2m-bit filter onto m bits (OR-ing halves) preserves membership
  *     exactly — `((h mod 2m) mod m) = h mod m` — so concatenated files
  *     keep a valid (denser, never lying) filter with no re-read.
  *
  * At 100 TB: the filter costs ~1.25 bytes/value/column, planning reads
  * one sidecar (sharded with the manifest in a production port), and a
  * point DELETE plans O(matching files) tasks instead of O(live files).
  */
private[sources] object JsonDocBlooms {
  val SidecarName = "_bloom.json"
  val PropCols = "write.bloom.columns"

  /** Bits per distinct value (before power-of-two rounding). 10 bits
    * with 7 probes gives ~0.8% false positives. */
  val BitsPerValue = 10
  val NumProbes = 7

  /** Runtime In key sets above this size skip bloom pruning: the
    * planning cost is O(files x keys x probes), and a broad semi-join
    * key set prunes little anyway (its hoisted min/max already ran). */
  val MaxKeys = 1024

  /** `bits.length * 64` is always a power of two. */
  final case class Bloom(k: Int, bits: Array[Long]) {
    def m: Int = bits.length * 64
  }

  /** The table's declared bloom columns that exist in `schema` with an
    * indexable type. Unknown names and unsupported types are dropped
    * silently here but refused loudly at DDL time by GraftCatalog. */
  def declaredCols(path: String, schema: StructType): Seq[String] =
    GraftCatalog.tablePropsOf(path).get(PropCols).toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .filter(n => schema.fields.exists(f => f.name == n && indexable(f.dataType)))

  def indexable(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  /** DDL-time validation (CREATE TABLE / ALTER ... SET TBLPROPERTIES):
    * a typo'd or untypeable declaration refuses loudly at declaration,
    * not by silently never building filters. */
  def validateDecl(decl: String, schema: StructType): Unit =
    decl.split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
      val f = schema.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"graft catalog: $PropCols names unknown column '$n'"))
      require(indexable(f.dataType),
        s"graft catalog: $PropCols column '$n' has type ${f.dataType.simpleString} " +
          "— bloom filters index long/int/string columns only (equality keys)")
    }

  /** splitmix64 — full-avalanche finalizer over a long. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then mixed. */
  private def hashString(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix(h)
  }

  def hashLong(v: Long): Long = mix(v)

  /** The canonical 64-bit hash of a filter constant — None when the
    * constant's shape can't match the write-side accumulation (the
    * caller then keeps the file). Integral widths normalize to long, so
    * an `Integer` constant probes an int- or long-typed column's filter
    * exactly as the writer hashed it. */
  def hashConst(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(mix(l.longValue()))
    case i: java.lang.Integer => Some(mix(i.longValue()))
    case s: java.lang.Short => Some(mix(s.longValue()))
    case b: java.lang.Byte => Some(mix(b.longValue()))
    case s: String => Some(hashString(s))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(hashString(u.toString))
    case _ => None
  }

  private def setBit(bits: Array[Long], idx: Long): Unit = {
    val i = idx.toInt
    bits(i >>> 6) |= (1L << (i & 63))
  }

  private def getBit(bits: Array[Long], idx: Long): Boolean = {
    val i = idx.toInt
    (bits(i >>> 6) & (1L << (i & 63))) != 0L
  }

  /** ENHANCED double hashing (Dillinger & Manolios): probe i+1 adds a
    * quadratically-growing stride, so the probe set is never a plain
    * arithmetic progression — plain Kirsch–Mitzenmacher at a small m
    * degenerates to stride `h2 mod m`, where a handful of keys' APs
    * overlap and produce DETERMINISTIC false positives (observed: 500
    * against {0, 999, 10} at m = 64). Shared by build and query, so the
    * probe sequence can never drift between them. Returns false at the
    * first probe `f` rejects. */
  private def eachProbe(h: Long, m: Int)(f: Long => Boolean): Boolean = {
    val mask = m - 1L
    var a = h & mask
    var b = ((h >>> 33) | 1L) & mask
    var i = 0
    while (i < NumProbes) {
      if (!f(a)) return false
      a = (a + b) & mask
      b = (b + i.toLong) & mask
      i += 1
    }
    true
  }

  /** Build a filter from the accumulated value hashes of one column. */
  def build(hashes: Array[Long]): Bloom = {
    val n = math.max(1, hashes.length).toLong
    // next power of two >= n*bits, in long math (a 300M-row file would
    // overflow int). Floor 1024 bits: 128 bytes is noise in the sidecar
    // and keeps tiny files' filters sparse; cap 2^30 bits = 128 MiB
    // (fpp degrades gracefully past ~100M values; the filter stays
    // sound).
    val want = math.min(1L << 30, math.max(1024L, n * BitsPerValue))
    val m = java.lang.Long.highestOneBit(want * 2 - 1).toInt
    val bits = new Array[Long](m / 64)
    var j = 0
    while (j < hashes.length) {
      eachProbe(hashes(j), m) { idx => setBit(bits, idx); true }
      j += 1
    }
    Bloom(NumProbes, bits)
  }

  def mightContain(b: Bloom, h: Long): Boolean =
    eachProbe(h, b.m)(getBit(b.bits, _))

  /** OPTIMIZE's rebuild accumulator (r16): compaction already streams
    * every surviving line through an executor task, so the merged
    * file's filters are recomputed EXACTLY there — a fold-union of the
    * input filters would be sound but saturates when many small filters
    * OR into the smallest one's bits, planning nothing. One instance
    * per output bin; `add` hashes the declared columns of each
    * SURVIVING line (DV/eq-dropped rows never enter, so the rebuilt
    * filter sheds deleted keys too — tighter than the write-time one).
    * A token whose shape contradicts the declared type poisons that
    * column (no filter beats a lying one); renamed columns resolve
    * through the reader's own alias fallback so pre-rename lines hash
    * under the current name.
    *
    * `defaults` carries the hash of each column's frozen EXISTS_DEFAULT
    * (r17, the r16 advice's high item): the reader SERVES that value
    * for lines that lack the key entirely (rows predating an
    * `ADD COLUMN ... DEFAULT`), so a rebuilt filter that skipped absent
    * tokens would exclude the default — `WHERE col = <frozen default>`
    * would bloom-prune the compacted file and its pre-add rows would
    * silently vanish. Hashing the default on absence keeps the filter a
    * superset of SERVED values, which is the only soundness contract
    * that matters. Columns with no default stay skip-on-absent: the
    * reader serves NULL there, and NULL never matches an equality. */
  final class Rebuild(cols: Seq[(String, Boolean)],
      aliases: Map[String, Seq[String]],
      defaults: Map[String, Long] = Map.empty) extends Serializable {
    private val acc = cols.map { case (n, _) =>
      n -> new scala.collection.mutable.ArrayBuilder.ofLong }.toMap
    private val poisoned = scala.collection.mutable.Set.empty[String]

    def add(node: com.fasterxml.jackson.databind.JsonNode): Unit =
      cols.foreach { case (name, isString) =>
        if (!poisoned(name)) {
          val tok = Option(node.get(name)).filterNot(_.isNull).orElse(
            aliases.getOrElse(name, Seq.empty).iterator
              .map(a => Option(node.get(a)).filterNot(_.isNull))
              .collectFirst { case Some(t) => t })
          tok match {
            case Some(t) =>
              if (isString && t.isTextual) acc(name) += hashConst(t.asText()).get
              else if (!isString && t.isIntegralNumber) acc(name) += hashLong(t.asLong())
              else poisoned += name
            case None =>
              // absent key: the reader serves the frozen existence
              // default (if any) — the filter must contain it
              defaults.get(name).foreach(acc(name) += _)
          }
        }
      }

    /** The rebuilt entry, or "" when nothing usable survives. */
    def toJson: String = {
      val ok = cols.collect { case (n, _) if !poisoned(n) =>
        n -> build(acc(n).result()) }
      if (ok.isEmpty) "" else colsToJson(ok)
    }
  }

  // ---- JSON (de)serialization — the same sidecar idioms as JsonDocStats

  def colsToJson(cols: Seq[(String, Bloom)]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val cs = root.putObject("cols")
    cols.foreach { case (name, b) =>
      val c = cs.putObject(name)
      c.put("k", b.k)
      val bb = java.nio.ByteBuffer.allocate(b.bits.length * 8)
      b.bits.foreach(bb.putLong)
      c.put("bits", java.util.Base64.getEncoder.encodeToString(bb.array()))
      ()
    }
    mapper.writeValueAsString(root)
  }

  private def parseCols(n: com.fasterxml.jackson.databind.JsonNode): Map[String, Bloom] =
    Option(n.get("cols")).map { cs =>
      cs.fields().asScala.map { e =>
        val bytes = java.util.Base64.getDecoder.decode(e.getValue.get("bits").asText())
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val bits = Array.fill(bytes.length / 8)(bb.getLong())
        e.getKey -> Bloom(e.getValue.get("k").asInt(), bits)
      }.toMap
    }.getOrElse(Map.empty)

  /** Load the sidecar; any parse problem degrades to "no filters". */
  def load(path: String): Map[String, Map[String, Bloom]] = {
    val f = new java.io.File(path, SidecarName)
    if (!f.isFile) return Map.empty
    try {
      val root = new ObjectMapper().readTree(f)
      Option(root.get("files")).map { files =>
        files.fields().asScala.map(e => e.getKey -> parseCols(e.getValue)).toMap
      }.getOrElse(Map.empty)
    } catch { case _: Exception => Map.empty }
  }

  // same-JVM serialization per table path — the sidecar is a
  // read-modify-write (JsonDocStats' standing rationale)
  private val sidecarLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Merge per-file entries (rel-name -> colsToJson output; empty JSON
    * strings skipped) into the sidecar atomically. Driver-side only. */
  def mergeAndWrite(path: String, entries: Seq[(String, String)],
      dropNames: Set[String] = Set.empty): Unit = {
    val real = entries.filter(_._2.nonEmpty)
    if (real.isEmpty && dropNames.isEmpty) return
    sidecarLocks.computeIfAbsent(
      new java.io.File(path).getAbsolutePath, _ => new Object).synchronized {
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      val files = root.putObject("files")
      val f = new java.io.File(path, SidecarName)
      if (f.isFile) {
        try {
          Option(mapper.readTree(f).get("files")).foreach { old =>
            old.fields().asScala
              .filterNot(e => dropNames.contains(e.getKey))
              // pin T (JsonDocStats' checkcast-on-Nothing trap)
              .foreach(e => {
                files.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue); ()
              })
          }
        } catch { case _: Exception => () }
      }
      real.foreach { case (name, json) =>
        files.set[com.fasterxml.jackson.databind.JsonNode](name, mapper.readTree(json)); ()
      }
      val tmp = new java.io.File(path, s".$SidecarName.tmp")
      java.nio.file.Files.writeString(tmp.toPath, mapper.writeValueAsString(root))
      val dst = new java.io.File(path, SidecarName)
      if (dst.exists()) dst.delete()
      if (!tmp.renameTo(dst))
        throw new java.io.IOException(s"bloom sidecar rename failed in $path")
    }
  }

  /** Extract the bloom-checkable point constraints of a conjunctive
    * filter set: column -> the hashes of the keys it must equal one of.
    * Only EqualTo/In qualify (a bloom can't answer ranges); un-hashable
    * or oversized key sets contribute nothing. */
  def pointConstraints(filters: Seq[Filter]): Seq[(String, Array[Long])] =
    filters.flatMap {
      case EqualTo(a, v) if a != JsonDocSource.FileMetaCol =>
        hashConst(v).map(h => a -> Array(h))
      case In(a, vs) if a != JsonDocSource.FileMetaCol =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.isEmpty || nonNull.length > MaxKeys) None
        else {
          val hs = nonNull.map(hashConst)
          if (hs.forall(_.isDefined)) Some(a -> hs.flatten.toArray) else None
        }
      case _ => None
    }

  /** Compile a per-file KEEP predicate from the effective filters. Only
    * loads the sidecar when a point constraint exists; every gap keeps.
    * A file is dropped only when some conjunct's ENTIRE key set is
    * provably absent from that file's filter. */
  def pruner(path: String, filters: Seq[Filter]): String => Boolean = {
    val constraints = pointConstraints(filters)
    if (constraints.isEmpty) return _ => true
    val blooms = load(path)
    if (blooms.isEmpty) return _ => true
    rel => blooms.get(rel) match {
      case None => true
      case Some(cols) => constraints.forall { case (c, hs) =>
        cols.get(c) match {
          case None => true
          case Some(b) => hs.exists(mightContain(b, _))
        }
      }
    }
  }
}
