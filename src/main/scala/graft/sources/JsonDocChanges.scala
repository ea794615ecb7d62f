package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** ROW-LEVEL CHANGE DATA FEED — `path#changes` (and the reader-option
  * form `spark.read.format("graft-jsondoc").option("readChanges","true")`)
  * — computed ON DEMAND from the snapshot lineage, with no stored change
  * files (the Iceberg changelog-scan model; Delta CDF's schema shape:
  * every data column plus `_change_type` / `_commit_version` /
  * `_commit_ms`).
  *
  * Semantics: for each PUBLISHED commit `v` in the requested range, the
  * feed emits the row-level difference against the previous published
  * snapshot `p`:
  *
  *  - files added at `v` → their rows (minus positions already
  *    delete-vectored at `v`) as `insert`;
  *  - files removed at `v` → the rows still live at `p` (DV and
  *    equality-delete folded as of `p`) as `delete`;
  *  - delete-vector GROWTH on surviving files → exactly the newly dead
  *    positions as `delete` (the merge-on-read MERGE/UPDATE/DELETE path:
  *    old images surface without rewriting anything);
  *  - delete-vector SHRINKAGE (rollback) → resurrected positions as
  *    `insert`;
  *  - equality-delete sets added at `v` → the matching rows in files
  *    older than the set, live at `p`, as `delete` (the streaming-upsert
  *    path — the feed reads the BASE files to materialize the old
  *    images, the same read the eq fold already performs at scan);
  *  - equality-delete sets dropped at `v` (rollback) → the resurrected
  *    matches as `insert`.
  *
  * Commits whose operation is a pure REWRITE (`optimize` — compaction,
  * clustering, DV/eq purge) are logical identities and emit NOTHING;
  * staged (write-audit-publish / branch) snapshots are invisible until
  * published, exactly as they are to normal reads. A copy-on-write
  * command (`rewrite`) replaces whole files, so its feed rows are the
  * full removed/added file contents — a valid changelog in which
  * untouched rows appear as delete+insert pairs with identical content;
  * consumers wanting net rows cancel those pairs with one aggregation
  * (the q204 reconstruction shows the idiom), while MERGE-ON-READ
  * tables emit exact row-level changes with no pairs to cancel.
  *
  * Scale shape: planning is manifest-arithmetic on the driver (the
  * states are O(changed files) incremental records; DV contents read
  * driver-side are deleted-row-count sized — the quantity MOR exists to
  * keep small between compactions). Executor work reads ONLY the files
  * a commit actually touched, one task per (file, commit, change kind);
  * an eq-delete commit additionally probes the files older than its set
  * — the same cost profile as Iceberg's changelog scan, repaid by
  * OPTIMIZE which garbage-collects the sets (and, being a rewrite,
  * never re-emits the rows it rewrites). */
private[sources] class JsonDocChangesTable(path: String, dataSchema: StructType,
    startV: Option[Int] = None, endV: Option[Int] = None,
    lenientStart: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsondoc($path#changes)"
  override def schema(): StructType = JsonDocChanges.feedSchema(dataSchema)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonDocChangesScanBuilder(path, dataSchema, startV, endV, lenientStart)
}

/** Pushdown on the feed's METADATA columns: comparisons against
  * `_commit_version` / `_commit_ms` prune whole commits at PLANNING
  * ("changes since version n / since last Monday" never plans the old
  * lineage). Pruning is conservative — every filter stays residual, so
  * Spark re-applies them row-level; a commit with no recorded mtime is
  * never ms-pruned. */
private[sources] class JsonDocChangesScanBuilder(path: String,
    dataSchema: StructType, startV: Option[Int], endV: Option[Int],
    lenientStart: Boolean = false)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var pushed: Array[Filter] = Array.empty

  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(c, _: Number) => c == JsonDocChanges.CommitVersionCol ||
      c == JsonDocChanges.CommitMsCol
    case GreaterThan(c, _: Number) => c == JsonDocChanges.CommitVersionCol ||
      c == JsonDocChanges.CommitMsCol
    case GreaterThanOrEqual(c, _: Number) => c == JsonDocChanges.CommitVersionCol ||
      c == JsonDocChanges.CommitMsCol
    case LessThan(c, _: Number) => c == JsonDocChanges.CommitVersionCol ||
      c == JsonDocChanges.CommitMsCol
    case LessThanOrEqual(c, _: Number) => c == JsonDocChanges.CommitVersionCol ||
      c == JsonDocChanges.CommitMsCol
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(prunable)
    filters // all residual: the prune is planning-level, rows re-check
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new JsonDocChangesScan(path, dataSchema, startV, endV, pushed, lenientStart)
}

private[sources] object JsonDocChanges {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitMsCol = "_commit_ms"

  /** Ops that rewrite bytes without changing table CONTENT — their
    * commits emit no feed rows: `optimize` (compaction, DV/eq purge)
    * and `cluster` (the declared layout rewrite a `cluster-by`
    * overwrite records). (`rewrite` is NOT here: that is the
    * copy-on-write row-level command, a logical change; nor plain
    * `overwrite` — a truncate-replace changes content.) */
  private[sources] val IdentityOps = Set("optimize", "cluster")

  def feedSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields.toSeq ++ Seq(
      StructField(ChangeTypeCol, StringType, nullable = false),
      StructField(CommitVersionCol, LongType, nullable = false),
      StructField(CommitMsCol, LongType, nullable = true)))

  /** The published lineage, ascending — the commits the feed can emit.
    * Staged (WAP/branch) snapshots are invisible until published, same
    * as to normal reads. */
  def publishedVersions(path: String): Seq[Int] =
    JsonDocVersions.manifests(path).sorted.toSeq
      .filterNot(v => JsonDocVersions.readStaged(path, v))

  /** Feed partitions for every published commit in `[lo, hi]`, each
    * diffed against its published predecessor (which may precede `lo` —
    * a commit's changes are defined by its own diff regardless of the
    * requested window). Shared by the batch scan and the streaming
    * source so both deliver identical rows for a commit. */
  def partsBetween(path: String, published: Seq[Int], lo: Int,
      hi: Int): Array[InputPartition] =
    partsWhere(path, published, v => v >= lo && v <= hi)

  /** Range generalized to a COMMIT PREDICATE (pushed-filter pruning): a
    * commit failing `keep` plans nothing, but still participates as the
    * diff basis of its successor. */
  def partsWhere(path: String, published: Seq[Int],
      keep: Int => Boolean): Array[InputPartition] = {
    // Retention guard: vacuum/expiry drops the OLDEST manifests, so
    // when the lineage no longer starts at v1 the earliest surviving
    // PUBLISHED commit may have lost its diff basis — emitting it would
    // silently claim the whole live set as that commit's inserts
    // (fold-consistent but a per-commit lie). Refuse loudly, like
    // reading a vacuumed snapshot does. Conservative on purpose: with a
    // truncated prefix there is no way to tell a vacuumed published
    // basis from staged-only predecessors (which WOULD make EmptyState
    // the true basis), so any truncated lineage refuses its earliest
    // published commit.
    val all = JsonDocVersions.manifests(path)
    published.headOption.foreach { first =>
      if (keep(first) && all.nonEmpty && all.min > 1)
        throw new IllegalStateException(
          s"graft-jsondoc changes: the lineage of $path starts at v${all.min} " +
            s"(older snapshots expired/vacuumed), so v$first's changes cannot " +
            s"be computed — request startingVersion > $first, or keep snapshots " +
            "at least as long as feed consumers")
    }
    val parts = Seq.newBuilder[InputPartition]
    var prev: Option[Int] = None
    for (v <- published) {
      if (keep(v)) {
        val op = JsonDocVersions.readOp(path, v).getOrElse("")
        if (!IdentityOps.contains(op))
          parts ++= commitParts(path, v, prev)
      }
      prev = Some(v)
    }
    parts.result().toArray
  }

  /** The feed partitions of one commit `v` against its published
    * predecessor `p` — pure manifest/DV arithmetic on the driver. */
  private def commitParts(path: String, v: Int,
      p: Option[Int]): Seq[InputPartition] = {
    def abs(rel: String): String = new java.io.File(path, rel).getAbsolutePath
    def stateOf(x: Int) = JsonDocVersions.state(path, x).getOrElse(
      throw new IllegalStateException(
        s"graft-jsondoc changes: manifest v$x of $path is unreadable (expired/" +
          "vacuumed?) — keep snapshots at least as long as feed consumers"))
    val stP = p.map(stateOf).getOrElse(JsonDocVersions.EmptyState)
    val stV = stateOf(v)
    val ms = JsonDocVersions.mtime(path, v)
    val vL = v.toLong

    // applicable eq sets of a state for one file: sets committed AFTER
    // the file was added (the addedAt sequencing the scan reader uses)
    def appEq(st: JsonDocVersions.TableState, f: String): Seq[String] = {
      val added = st.addedAt.getOrElse(f, Int.MaxValue)
      st.eqs.collect { case (ev, n) if ev > added => abs(n) }
    }

    val out = Seq.newBuilder[InputPartition]
    val added = stV.live -- stP.live
    val removed = stP.live -- stV.live
    val survivors = (stV.live & stP.live).toSeq.sorted

    for (f <- added.toSeq.sorted)
      out += JsonDocChangesPartition(abs(f), f, "insert", vL, ms,
        innerDvPath = stV.dvs.get(f).map(abs).getOrElse(""))
    for (f <- removed.toSeq.sorted)
      out += JsonDocChangesPartition(abs(f), f, "delete", vL, ms,
        innerDvPath = stP.dvs.get(f).map(abs).getOrElse(""),
        innerEqPaths = appEq(stP, f))

    val eqNew = stV.eqs.toSet -- stP.eqs.toSet
    val eqGone = stP.eqs.toSet -- stV.eqs.toSet

    for (f <- survivors) {
      val dvNameP = stP.dvs.get(f)
      val dvNameV = stV.dvs.get(f)
      // identical DV name = identical content (DV files are immutable);
      // only a changed name can carry a position delta
      lazy val dvSetP: Set[Long] =
        dvNameP.map(n => JsonDocDeleteVectors.read(path, n)).getOrElse(Set.empty)
      lazy val dvSetV: Set[Long] =
        dvNameV.map(n => JsonDocDeleteVectors.read(path, n)).getOrElse(Set.empty)
      val dvChanged = dvNameP != dvNameV
      val grow: Set[Long] = if (dvChanged) dvSetV -- dvSetP else Set.empty
      val shrink: Set[Long] = if (dvChanged) dvSetP -- dvSetV else Set.empty
      if (grow.nonEmpty)
        out += JsonDocChangesPartition(abs(f), f, "delete", vL, ms,
          innerEqPaths = appEq(stP, f), keepPos = Some(grow.toSeq.sorted))
      if (shrink.nonEmpty)
        out += JsonDocChangesPartition(abs(f), f, "insert", vL, ms,
          innerEqPaths = appEq(stV, f), keepPos = Some(shrink.toSeq.sorted))

      // an eq set applies to files added BEFORE it; a file and a set
      // committed together never interact (an epoch's inserts don't
      // fold their own delete — the scan-side rule, reproduced here)
      val addedF = stV.addedAt.getOrElse(f, Int.MaxValue)
      val newHits = eqNew.collect { case (ev, n) if ev > addedF => abs(n) }.toSeq.sorted
      val goneHits = eqGone.collect { case (ev, n) if ev > addedF => abs(n) }.toSeq.sorted
      if (newHits.nonEmpty)
        out += JsonDocChangesPartition(abs(f), f, "delete", vL, ms,
          innerDvPath = dvNameP.map(abs).getOrElse(""),
          innerEqPaths = appEq(stP, f),
          skipPos = grow.toSeq.sorted, keepEqPaths = newHits)
      if (goneHits.nonEmpty)
        out += JsonDocChangesPartition(abs(f), f, "insert", vL, ms,
          innerDvPath = dvNameV.map(abs).getOrElse(""),
          innerEqPaths = appEq(stV, f),
          skipPos = shrink.toSeq.sorted, keepEqPaths = goneHits)
    }
    out.result()
  }
}

/** One (file, commit, kind) unit of change-feed work. `innerDvPath` /
  * `innerEqPaths` configure the wrapped snapshot reader's standard dead-
  * row folding (rows skipped before they can be emitted); `keepPos` /
  * `skipPos` constrain emission to exact positions; `keepEqPaths`
  * constrains emission to rows matching ANY of the named eq-delete sets
  * (match-any, so a row hit by several sets emits once). */
private[sources] case class JsonDocChangesPartition(
    file: String, rel: String, changeType: String,
    commitVersion: Long, commitMs: Option[Long],
    innerDvPath: String = "", innerEqPaths: Seq[String] = Seq.empty,
    keepPos: Option[Seq[Long]] = None, skipPos: Seq[Long] = Seq.empty,
    keepEqPaths: Seq[String] = Seq.empty) extends InputPartition

private[sources] class JsonDocChangesScan(path: String, dataSchema: StructType,
    startV: Option[Int], endV: Option[Int],
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    lenientStart: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = JsonDocChanges.feedSchema(dataSchema)
  override def toBatch: Batch = this

  /** Does commit `v` survive the pushed metadata filters? Conservative:
    * unknown shapes keep, a missing mtime keeps (the residual filter
    * settles it row-level). */
  private def keepCommit(v: Int): Boolean = {
    import org.apache.spark.sql.sources._
    val vl = v.toLong
    lazy val ms = JsonDocVersions.mtime(path, v)
    def cmp(c: String)(ok: Long => Boolean): Boolean =
      if (c == JsonDocChanges.CommitVersionCol) ok(vl)
      else if (c == JsonDocChanges.CommitMsCol) ms.forall(ok)
      else true
    pushed.forall {
      case EqualTo(c, x: Number) => cmp(c)(_ == x.longValue)
      case GreaterThan(c, x: Number) => cmp(c)(_ > x.longValue)
      case GreaterThanOrEqual(c, x: Number) => cmp(c)(_ >= x.longValue)
      case LessThan(c, x: Number) => cmp(c)(_ < x.longValue)
      case LessThanOrEqual(c, x: Number) => cmp(c)(_ <= x.longValue)
      case _ => true
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val published = JsonDocChanges.publishedVersions(path)
    if (published.isEmpty) return Array.empty
    val lo = startV.getOrElse(published.head)
    val hi = endV.getOrElse(published.last)
    // The empty-result escape is ONLY for bounds the engine resolved past
    // the head ('latest', a start timestamp beyond the newest commit, or an
    // unset start) — an EXPLICITLY inverted range (startingVersion =
    // endingVersion + 1) is a user error and must fail the require below
    // like every other inverted range.
    if (lenientStart && lo == hi + 1) return Array.empty // no new commits yet
    require(lo <= hi,
      s"graft-jsondoc changes: startingVersion $lo exceeds endingVersion $hi")
    require(hi <= published.last,
      s"graft-jsondoc changes: endingVersion $hi is beyond the latest published " +
        s"snapshot v${published.last} of $path")
    JsonDocChanges.partsWhere(path, published,
      v => v >= lo && v <= hi && keepCommit(v))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonDocChangesReaderFactory(dataSchema, GraftCatalog.renamesOf(path), path)

  /** STREAMING change feed (r15): the feed as a micro-batch source —
    * offsets are PUBLISHED SNAPSHOT VERSIONS, each batch the feed rows
    * of the commits in `(start, end]`. This is the CDC escape hatch
    * from the append-only streaming contract: the plain streaming
    * source must ABORT under rewrites and equality deletes (a
    * file-granular offset cannot represent them — see
    * [[JsonDocMicroBatchStream.validateAppendOnly]]), while this source
    * delivers them as explicit delete/insert rows. Replays are exact:
    * manifests and their files are immutable, so re-planning a
    * checkpointed version window yields byte-identical batches; an
    * expired (vacuumed) window aborts loudly instead of delivering a
    * partial diff. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new JsonDocChangesMicroBatchStream(path, dataSchema, startV, endV)

  override def description(): String =
    s"graft-jsondoc changes path=$path range=[${startV.getOrElse("first")}, " +
      s"${endV.getOrElse("latest")}]"
}

/** Version-window offset of the streaming change feed: `v` = the last
  * published snapshot whose changes have been delivered. */
private[sources] case class ChangesOffset(v: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"changesVersion":$v}"""
}

private[sources] class JsonDocChangesMicroBatchStream(path: String,
    dataSchema: StructType, startV: Option[Int], endV: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  /** Before the first delivered commit: `startingVersion - 1` when
    * given (that version's changes are the first batch — the inclusive
    * bound the batch read uses), else before the whole lineage. */
  override def initialOffset(): Offset =
    ChangesOffset(startV.map(_ - 1).getOrElse(0))

  /** The newest published commit, CAPPED at `endingVersion` when given
    * — a bounded backfill stream stops delivering at its end bound
    * instead of silently over-applying the future. */
  override def latestOffset(): Offset = {
    val published = JsonDocChanges.publishedVersions(path)
    val head = published.lastOption.getOrElse(startV.map(_ - 1).getOrElse(0))
    ChangesOffset(endV.fold(head)(math.min(head, _)))
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    ChangesOffset(node.get("changesVersion").asInt())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ChangesOffset].v + 1
    val hi = end.asInstanceOf[ChangesOffset].v
    if (lo > hi) return Array.empty
    JsonDocChanges.partsBetween(path, JsonDocChanges.publishedVersions(path), lo, hi)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new JsonDocChangesReaderFactory(dataSchema, GraftCatalog.renamesOf(path), path)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class JsonDocChangesReaderFactory(dataSchema: StructType,
    aliases: Map[String, Seq[String]], path: String)
    extends PartitionReaderFactory {
  // existence defaults (r16; sidecar-authoritative r17, advice item 2):
  // resolved once, driver-side, from the TABLE PATH — a bare
  // readChanges with a user-declared schema carries no field metadata,
  // and the feed must emit pre-add rows with the same frozen
  // ADD COLUMN DEFAULT the direct read serves (consumers replaying the
  // feed land the same values a direct read would), so the resolution
  // goes through GraftCatalog.existsDefaultsForTable exactly like
  // JsonDocScanBuilder's
  private val existsDefaults: Map[String, Any] =
    GraftCatalog.existsDefaultsForTable(path, dataSchema)
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[JsonDocChangesPartition]
    // the wrapped snapshot reader does the parsing, rename mapping, DV
    // and eq-delete folding; `_pos` rides as a trailing column so the
    // wrapper can apply position constraints
    val innerSchema = StructType(dataSchema.fields.toSeq :+
      StructField(JsonDocSource.PosMetaCol, LongType, nullable = false))
    val inner = new JsonDocReader(p.file, innerSchema, Array.empty, None, p.rel,
      p.innerDvPath, aliases, p.innerEqPaths, existsDefaults)
    new JsonDocChangesReader(inner, dataSchema, aliases, p)
  }
}

/** Wraps one [[JsonDocReader]] and turns surviving rows into feed rows:
  * applies the partition's position / eq-match emission constraints,
  * then appends `_change_type` / `_commit_version` / `_commit_ms`. */
private[sources] class JsonDocChangesReader(inner: JsonDocReader,
    dataSchema: StructType, aliases: Map[String, Seq[String]],
    part: JsonDocChangesPartition) extends PartitionReader[InternalRow] {

  private val nData = dataSchema.length
  private val keep: java.util.HashSet[java.lang.Long] = part.keepPos match {
    case Some(ps) => val s = new java.util.HashSet[java.lang.Long]()
      ps.foreach(p => s.add(p)); s
    case None => null
  }
  private val skip: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long]()
    part.skipPos.foreach(p => s.add(p)); s
  }

  /** Eq-set matching against the MATERIALIZED row (the wrapped reader
    * already resolved renames into current-schema values): each set's
    * key names resolve to a field index — by current name, or through
    * the rename aliases when the set predates a rename. */
  private case class Matcher(idx: Array[Int], types: Array[String],
      rows: java.util.HashSet[Seq[Any]])
  private val matchers: Seq[Matcher] = part.keepEqPaths.map { ep =>
    val eq = JsonDocEqDeletes.read(ep)
    val idx = eq.keys.map { k =>
      val i = dataSchema.fieldNames.indexOf(k)
      if (i >= 0) i
      else dataSchema.fieldNames.indexWhere(cur =>
        aliases.getOrElse(cur, Seq.empty).contains(k))
    }.toArray
    Matcher(idx, eq.types.toArray, eq.rows)
  }

  private def canonical(row: InternalRow, i: Int, tag: String): Any =
    dataSchema(i).dataType match {
      case LongType => row.getLong(i)
      case IntegerType => row.getInt(i).toLong
      case DoubleType => row.getDouble(i)
      case BooleanType => row.getBoolean(i)
      case _ => if (tag == "long") row.getUTF8String(i).toString.toLong
        else row.getUTF8String(i).toString
    }

  private def matchesAny(row: InternalRow): Boolean = matchers.exists { m =>
    var i = 0
    var miss = false
    val tuple = new Array[Any](m.idx.length)
    while (i < m.idx.length && !miss) {
      val fi = m.idx(i)
      if (fi < 0 || row.isNullAt(fi)) miss = true
      else tuple(i) = canonical(row, fi, m.types(i))
      i += 1
    }
    !miss && m.rows.contains(scala.collection.immutable.ArraySeq.unsafeWrapArray(tuple))
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null && inner.next()) {
      val row = inner.get()
      val pos = row.getLong(nData)
      val posOk = (keep == null || keep.contains(pos)) && !skip.contains(pos)
      if (posOk && (matchers.isEmpty || matchesAny(row))) {
        val values = new Array[Any](nData + 3)
        var i = 0
        while (i < nData) {
          values(i) = if (row.isNullAt(i)) null else row.get(i, dataSchema(i).dataType)
          i += 1
        }
        values(nData) = UTF8String.fromString(part.changeType)
        values(nData + 1) = part.commitVersion
        values(nData + 2) = part.commitMs.map(Long.box).orNull
        current = InternalRow.fromSeq(scala.collection.immutable.ArraySeq
          .unsafeWrapArray(values))
      }
    }
    current != null
  }

  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}
