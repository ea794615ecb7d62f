package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** DELETE-VECTOR files (r14, merge-on-read): `_dv-<uuid>.json` in the
  * table root, each naming the deleted row POSITIONS of one data file —
  *
  *   `{"file": <rel>, "positions": [p0, p1, ...]}`
  *
  * A position is the row's 0-based index among the file's non-empty
  * lines (the reader's iteration order — stable because data files are
  * immutable once committed). DV files are immutable too: a further
  * MOR delete writes a NEW DV holding the union of positions and the
  * manifest repoints `dvs[rel]` — so every snapshot version reads its
  * own deletion state (time travel), and a reader planned against
  * version N folds N's DVs while a writer commits N+1. Underscore
  * prefix = invisible to every data listing; vacuum reclaims DVs no
  * kept manifest references. */
private[sources] object JsonDocDeleteVectors {
  val Prefix = "_dv-"

  /** Write a DV (dot-temp + rename: readers never see a partial file);
    * returns its name for the manifest's dvs map. */
  def write(path: String, rel: String, positions: Set[Long]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("file", rel)
    val arr = root.putArray("positions")
    positions.toSeq.sorted.foreach(arr.add)
    val name = s"$Prefix${java.util.UUID.randomUUID().toString.take(12)}.json"
    val dir = new java.io.File(path)
    dir.mkdirs()
    val tmp = new java.io.File(dir, s".$name.tmp")
    java.nio.file.Files.writeString(tmp.toPath, mapper.writeValueAsString(root))
    val dst = new java.io.File(dir, name)
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"delete-vector rename failed: $name in $path")
    name
  }

  /** A manifest-referenced DV must exist — a missing one means the
    * directory was corrupted/hand-vacuumed; silently reading "no
    * deletes" would resurrect deleted rows. */
  def read(path: String, name: String): Set[Long] = {
    val f = new java.io.File(path, name)
    if (!f.isFile)
      throw new IllegalStateException(
        s"graft-jsondoc: delete vector $name of $path is missing — the directory " +
          "was corrupted or manually cleaned; restore it or re-write the table")
    val node = new ObjectMapper().readTree(f)
    Option(node.get("positions"))
      .map(_.elements().asScala.map(_.asLong()).toSet).getOrElse(Set.empty)
  }

  /** Per-file DELETED-ROW counts of a snapshot (rel -> count), for
    * exact-row accounting in numRows/#files/#history/#partitions. */
  def countsFor(path: String, pinned: Option[Int]): Map[String, Long] =
    JsonDocVersions.dvsFor(path, pinned).map { case (rel, dv) =>
      rel -> read(path, dv).size.toLong
    }
}

/** EQUALITY-DELETE files (r15, the r14 verdict's item 2 — Iceberg v2's
  * equality deletes re-expressed): `_eq-<uuid>.json` in the table root,
  * each naming a KEY TUPLE SET that deletes matching rows —
  *
  *   `{"keys": ["k"], "types": ["long"], "rows": [[3], [17], ...]}`
  *
  * Unlike a position delete (DV), an equality delete needs NO
  * read-before-write: a streaming CDC upsert just writes its new rows
  * plus one eq-delete of their keys per epoch — last-wins upsert with
  * zero scans of the base table. SEQUENCING is by manifest version: an
  * eq-delete committed at version E applies to data files ADDED at
  * versions < E (the manifest's per-file `addedAt`), so an epoch's own
  * inserts survive its own delete. Readers fold applicable eq sets at
  * scan beside position DVs; OPTIMIZE applies them during rewrite
  * (outputs re-sequence above every existing eq, which garbage-collects
  * the entries); vacuum sweeps unreferenced eq files. */
private[sources] object JsonDocEqDeletes {
  val Prefix = "_eq-"

  /** One loaded eq-delete: key column names (current schema names),
    * canonical type tags, and the tuple membership set. Values are
    * canonical boxes: Long (ints widened), Double, Boolean, String. */
  final case class EqSet(keys: Seq[String], types: Seq[String],
      rows: java.util.HashSet[Seq[Any]])

  def typeTag(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType => "long"
    case org.apache.spark.sql.types.DoubleType => "double"
    case org.apache.spark.sql.types.BooleanType => "boolean"
    case _ => "string"
  }

  /** Write an eq-delete file (dot-temp + rename; readers never see a
    * partial file); returns its name for the manifest's eqAdd list. */
  def write(path: String, keys: Seq[String], types: Seq[String],
      rows: Iterable[Seq[Any]]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val ks = root.putArray("keys"); keys.foreach(ks.add)
    val ts = root.putArray("types"); types.foreach(ts.add)
    val rs = root.putArray("rows")
    rows.foreach { tuple =>
      val arr = rs.addArray()
      tuple.foreach {
        case l: Long => arr.add(l)
        case l: java.lang.Long => arr.add(l.longValue())
        case d: Double => arr.add(d)
        case d: java.lang.Double => arr.add(d.doubleValue())
        case b: Boolean => arr.add(b)
        case b: java.lang.Boolean => arr.add(b.booleanValue())
        case s => arr.add(String.valueOf(s))
      }
    }
    val name = s"$Prefix${java.util.UUID.randomUUID().toString.take(12)}.json"
    val dir = new java.io.File(path)
    dir.mkdirs()
    val tmp = new java.io.File(dir, s".$name.tmp")
    java.nio.file.Files.writeString(tmp.toPath, mapper.writeValueAsString(root))
    val dst = new java.io.File(dir, name)
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"equality-delete rename failed: $name in $path")
    name
  }

  /** Executor-side memo: eq files are immutable once committed and one
    * scan re-resolves the same file for MANY partitions; bounded, and
    * simply cleared when full (files are small — a reload is cheap). */
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, EqSet]()

  /** A manifest-referenced eq file must exist — silently reading "no
    * deletes" would resurrect deleted rows (the DV rule, verbatim). */
  def read(absPath: String): EqSet = {
    val hit = cache.get(absPath)
    if (hit != null) return hit
    val f = new java.io.File(absPath)
    if (!f.isFile)
      throw new IllegalStateException(
        s"graft-jsondoc: equality-delete file $absPath is missing — the directory " +
          "was corrupted or manually cleaned; restore it or re-write the table")
    val node = new ObjectMapper().readTree(f)
    val keys = Option(node.get("keys"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val types = Option(node.get("types"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val rows = new java.util.HashSet[Seq[Any]]()
    Option(node.get("rows")).foreach(_.elements().asScala.foreach { arr =>
      val tuple = arr.elements().asScala.zip(types.iterator).map {
        case (v, "long") => v.asLong(): Any
        case (v, "double") => v.asDouble(): Any
        case (v, "boolean") => v.asBoolean(): Any
        case (v, _) => v.asText(): Any
      }.toSeq
      rows.add(tuple)
      ()
    })
    val eq = EqSet(keys, types, rows)
    if (cache.size() > 64) cache.clear()
    cache.putIfAbsent(absPath, eq)
    eq
  }

  /** Is this parsed row deleted by any of `eqs`? Key extraction is
    * RENAME-aware (the aliases map the reader/compactor already holds):
    * a pre-rename file's rows match under their old key names. A
    * null/missing key can never match — writers refuse null keys. ONE
    * implementation shared by the scan reader and the compaction
    * rewrite, so they cannot disagree on visibility. */
  def rowDeleted(node: com.fasterxml.jackson.databind.JsonNode,
      eqs: Seq[EqSet], aliases: Map[String, Seq[String]]): Boolean = {
    def fieldNode(name: String): com.fasterxml.jackson.databind.JsonNode = {
      val v = node.get(name)
      if (v != null) v
      else aliases.get(name) match {
        case Some(olds) => olds.iterator.map(node.get).collectFirst {
          case n if n != null => n
        }.orNull
        case None => null
      }
    }
    rowDeleted(fieldNode _, eqs)
  }

  /** Lookup-function variant (r19): the scan reader's token-capture
    * path supplies its own alias-aware field lookup, so the extraction
    * logic stays single-sourced here while the caller owns how a key
    * name resolves to a node. */
  def rowDeleted(fieldNode: String => com.fasterxml.jackson.databind.JsonNode,
      eqs: Seq[EqSet]): Boolean = {
    eqs.exists { eq =>
      var i = 0
      var miss = false
      val tuple = new Array[Any](eq.keys.length)
      while (i < eq.keys.length && !miss) {
        val v = fieldNode(eq.keys(i))
        if (v == null || v.isNull) miss = true
        else tuple(i) = eq.types(i) match {
          case "long" => v.asLong()
          case "double" => v.asDouble()
          case "boolean" => v.asBoolean()
          case _ => v.asText()
        }
        i += 1
      }
      !miss && eq.rows.contains(scala.collection.immutable.ArraySeq.unsafeWrapArray(tuple))
    }
  }
}

/** DELTA-BASED (merge-on-read) row-level operation — the other half of
  * the design space beside [[JsonDocRowLevelOperation]]'s copy-on-write
  * (r14, the r13 verdict's top item): `SupportsDelta` makes Spark plan
  * `WriteDelta` instead of `ReplaceData`, so MERGE/UPDATE/DELETE emit a
  * stream of per-row OPERATIONS — delete(_file, _pos), insert(row) —
  * instead of rewriting every matched file's contents. The commit
  * writes per-file delete vectors plus ordinary data files for inserts;
  * no existing data file is touched. Copy-on-write's worst case — a
  * UNIFORM delta (every file holds a matched key) rewrites the whole
  * table, and clustering cannot bound it — becomes O(changed rows).
  * The read side pays the fold: every subsequent scan filters each
  * file's DV positions until OPTIMIZE purges them (compaction applies
  * DVs and emits clean files).
  *
  * Mode selection is DECLARED, not guessed: the table property
  * `write.rowlevel.mode = merge-on-read` (Iceberg's
  * `write.merge.mode` idiom; default copy-on-write). A matched-file-
  * fraction heuristic cannot exist at this layer — the operation shape
  * is fixed at ANALYSIS time, before the matched set is known; engines
  * that "choose" do it exactly like this, per table, by workload.
  *
  * The scan accepts full pushdown (unlike the COW rewrite scan): a
  * delta write only affects rows it explicitly identifies, so a row the
  * scan never returns is simply left untouched on disk — there is no
  * read-then-replace coupling to corrupt. rowId = (_file, _pos), the
  * Iceberg position-delta shape; updates are represented as
  * delete+insert (the only honest encoding when the row may move
  * between partition directories). */
private[sources] class JsonDocDeltaOperation(schema: StructType, path: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation with SupportsDelta {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap) =
    // BRANCH DML (r17 — lifts the r14 append-only rule the coherent
    // way): with `write.wap.branch` set, the row-level scan reads the
    // BRANCH HEAD's state (its chain's files and delete vectors), so
    // the delta's positions, matched rows and inserted images are all
    // relative to the chain being extended — exactly the semantics a
    // mergeable branch needs (q230/MergeBranchSpec)
    new JsonDocScanBuilder(schema, path,
      pinned = JsonDocDelta.branchHeadOf(path).filter(_ > 0))
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new JsonDocDeltaWriteBuilder(path, info, cmd)
  override def requiredMetadataAttributes(): Array[NamedReference] = Array(
    Expressions.column(JsonDocSource.FileMetaCol),
    Expressions.column(JsonDocSource.PosMetaCol))
  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(JsonDocSource.FileMetaCol),
    Expressions.column(JsonDocSource.PosMetaCol))
  override def representUpdateAsDeleteAndInsert(): Boolean = true
}

private[sources] class JsonDocDeltaWriteBuilder(path: String, info: LogicalWriteInfo,
    cmd: RowLevelOperation.Command) extends DeltaWriteBuilder {
  {
    val bad = info.schema().fields.filterNot(f => JsonDocSource.supportedType(f.dataType))
    require(bad.isEmpty,
      "graft-jsondoc writes long/int/double/boolean/string fields only; unsupported: " +
        bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
  }
  override def build(): DeltaWrite = new DeltaWrite {
    override def toBatch: DeltaBatchWrite = {
      // branch MOR DML (r17): the scan above pinned to the branch head,
      // so the delta commits STAGED, chained on that head
      val branch = GraftCatalog.tablePropsOf(path).get("write.wap.branch")
      new JsonDocDeltaBatchWrite(path, info.schema(), info.queryId(), cmd,
        // WAP staging (r14): SQL DML has no writer-option channel, so
        // the table property is the only trigger here
        staged = branch.isDefined || GraftCatalog.tablePropsOf(path)
          .get("write.wap.staged").contains("true"),
        branch = branch)
    }
  }
}

private[sources] object JsonDocDelta {
  /** The branch head a `write.wap.branch` table property names — the
    * branch must exist (create_branch first); 0 = created, no commits
    * yet (the chain starts off published state). */
  def branchHeadOf(path: String): Option[Int] =
    GraftCatalog.tablePropsOf(path).get("write.wap.branch").map { n =>
      JsonDocRefs.branches(path).getOrElse(n, throw new IllegalArgumentException(
        s"graft-jsondoc: no branch '$n' on $path — CALL create_branch first"))
    }
}

/** One task's delta: deleted positions per file, plus any insert files
  * written through the ordinary two-phase writers. */
private[sources] case class JsonDocDeltaCommitMessage(
    deletes: Map[String, Seq[Long]],
    inserts: Seq[JsonDocCommitMessage]) extends WriterCommitMessage

/** Commit = write the unioned delete vectors, rename the insert temps,
  * then ONE manifest claim carrying both (`added` = insert files,
  * `dvs` repointed) — the same single atomic point as every other
  * commit, so a crash anywhere leaves the prior version fully intact
  * (new DVs/temps are unreferenced orphans vacuum sweeps). Existing
  * data files are never renamed, rewritten, or retired — the spec pins
  * that their bytes and mtimes are untouched.
  *
  * Concurrency: inserts rebase like any append; a DV on a file a
  * concurrent rewrite retired aborts loudly (commitDelta's dv-conflict
  * check). Two MOR writers deleting from the SAME file concurrently
  * are outside the source's single-writer SQL contract (the union is
  * read-modify-write) — the GraftTxn scaladoc's standing note. */
private[sources] class JsonDocDeltaBatchWrite(path: String, schema: StructType,
    queryId: String, cmd: RowLevelOperation.Command,
    staged: Boolean = false, branch: Option[String] = None) extends DeltaBatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new JsonDocDeltaWriterFactory(path, schema, queryId,
      GraftCatalog.partitionSpecOf(path),
      // CHECK constraints apply to MOR-INSERTED rows (driver-compiled
      // here — executors have no SparkSession); deletes identify
      // existing rows and carry nothing to check. A DELETE-ONLY delta
      // carries an EMPTY row projection, so there is nothing to compile
      // the constraints against — and nothing they could guard (advice
      // r14: compiling against the empty schema broke DELETE FROM on
      // any constrained MOR table at planning).
      if (schema.isEmpty) Seq.empty else GraftConstraints.forWrite(path, schema))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    // a LEGACY (manifest-less) directory gets its first manifest minted
    // from the visible listing before the delta applies — the DV update
    // below must name currently-live files, and "no manifest" means the
    // live set is the listing (the batch path's bootstrap rule, r14)
    if (JsonDocVersions.latest(path).isEmpty) {
      val live0 = JsonDocSource.listDataFiles(path)
        .map(f => JsonDocSource.relName(path, f)).toSet
      // a STAGED delta additionally needs the bootstrap even when the
      // listing is empty: without any published manifest the legacy
      // every-visible-file rule would expose the staged insert files
      if (live0.nonEmpty || staged)
        JsonDocVersions.commit(path, live0, op = "bootstrap")
    }
    val ms = messages.filter(_ != null).map(_.asInstanceOf[JsonDocDeltaCommitMessage])
    val merged: Map[String, Set[Long]] = ms.flatMap(_.deletes.toSeq)
      .groupBy(_._1).map { case (rel, xs) => rel -> xs.flatMap(_._2).toSet }
    // branch DML (r17): DVs union against the BRANCH HEAD's vectors —
    // the state the pinned scan read — and the commit chains on it
    val branchHead: Option[Int] = branch.map { n =>
      JsonDocRefs.branches(path).getOrElse(n, throw new IllegalArgumentException(
        s"graft-jsondoc: no branch '$n' on $path — CALL create_branch first"))
    }
    val prevDvs = JsonDocVersions.dvsFor(path, branchHead.filter(_ > 0))
    val dvUpdates = merged.map { case (rel, pos) =>
      val existing = prevDvs.get(rel)
        .map(JsonDocDeleteVectors.read(path, _)).getOrElse(Set.empty[Long])
      rel -> JsonDocDeleteVectors.write(path, rel, existing ++ pos)
    }
    val ins = ms.flatMap(_.inserts)
    ins.foreach { m =>
      val src = new java.io.File(dir, m.tmpName)
      val dst = new java.io.File(dir, m.finalName)
      Option(dst.getParentFile).foreach(_.mkdirs())
      if (!src.renameTo(dst))
        throw new java.io.IOException(
          s"delta commit rename failed: ${m.tmpName} -> ${m.finalName}")
    }
    val committed = JsonDocVersions.commitDelta(path, Set.empty,
      ins.map(_.finalName).toSet,
      GraftTxn.take(path), dvUpdates,
      op = s"merge-on-read ${cmd.toString.toLowerCase(java.util.Locale.ROOT)}",
      staged = staged, stagedBase = branchHead.filter(_ > 0))
    // repoint the branch head AFTER the chain-extending commit (the
    // batch append's crash rule: an orphan stage, never a wrong head)
    branch.foreach(n => JsonDocRefs.setBranchHead(path, n, committed))
    JsonDocStats.mergeAndWrite(path, ins.toSeq.map(m => m.finalName -> m.statsJson),
      keepExisting = true)
    JsonDocBlooms.mergeAndWrite(path, ins.toSeq.map(m => m.finalName -> m.bloomJson))
    // DV-debt repayment (r18): a row-level fold on an opted-in table
    // compacts inline once the live delete-vector count crosses the
    // threshold — continuous MV/index refresh stays bounded-read
    if (!staged && branch.isEmpty) JsonDocAutocompactDv.maybe(path)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.filter(_ != null).foreach {
      case m: JsonDocDeltaCommitMessage => m.inserts.foreach { e =>
        val f = new java.io.File(new java.io.File(path), e.tmpName)
        if (f.exists()) f.delete()
      }
      case _ => ()
    }
}

private[sources] class JsonDocDeltaWriterFactory(path: String, schema: StructType,
    queryId: String, partCols: Seq[GraftCatalog.PartField],
    checks: Seq[GraftConstraints.Check] = Seq.empty) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new JsonDocDeltaWriter(path, schema, queryId, partCols, partitionId, taskId, checks)
}

/** Accumulates (file -> deleted positions) in memory — bounded by this
  * task's share of MATCHED rows, the quantity a delta op exists to keep
  * small — and routes inserts through the ordinary two-phase batch
  * writers (partition-directory routing included), so insert files are
  * indistinguishable from appended ones. */
private[sources] class JsonDocDeltaWriter(path: String, schema: StructType,
    queryId: String, partCols: Seq[GraftCatalog.PartField],
    partitionId: Int, taskId: Long,
    checks: Seq[GraftConstraints.Check] = Seq.empty)
    extends DeltaWriter[InternalRow] {

  private val deletes =
    scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Long]]
  private var insertWriter: org.apache.spark.sql.connector.write.DataWriter[InternalRow] = _

  private def inserts(): org.apache.spark.sql.connector.write.DataWriter[InternalRow] = {
    if (insertWriter == null)
      insertWriter = new JsonDocWriterFactory(path, schema, queryId, partCols, checks)
        .createWriter(partitionId, taskId)
    insertWriter
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    // rowId order as declared: (_file, _pos)
    val file = id.getUTF8String(0).toString
    val pos = id.getLong(1)
    deletes.getOrElseUpdate(file, scala.collection.mutable.ArrayBuffer.empty) += pos
  }

  // representUpdateAsDeleteAndInsert = true, so Spark splits updates
  // itself; implement anyway so the contract holds either way
  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id)
    insert(row)
  }

  override def insert(row: InternalRow): Unit = inserts().write(row)

  override def commit(): WriterCommitMessage =
    JsonDocDeltaCommitMessage(
      deletes.map { case (f, ps) => f -> ps.toSeq }.toMap,
      if (insertWriter == null) Seq.empty
      else JsonDocCommitMessage.entriesOf(insertWriter.commit()))

  override def abort(): Unit = if (insertWriter != null) insertWriter.abort()
  override def close(): Unit = ()
}
