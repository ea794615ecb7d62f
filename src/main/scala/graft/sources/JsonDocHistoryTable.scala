package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** The `path#history` metadata table ([[GraftCatalog.loadTable]]): one
  * row per committed snapshot —
  *
  *   `(version BIGINT, n_files BIGINT, n_rows BIGINT NULLABLE)`
  *
  * `n_rows` is EXACT, summed from the stats sidecar, whenever every
  * file of that version has a sidecar entry (always true for
  * V2-written versions; retired files keep their entries precisely so
  * history stays computable) and NULL otherwise — the numRows-statistic
  * conservatism applied to history. Rows are computed at scan time on
  * the driver (the history of a table is manifest-count-sized, never
  * data-sized) and shipped in the single input partition. */
private[sources] class JsonDocHistoryTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsondoc($path#history)"
  override def schema(): StructType = JsonDocHistoryTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new JsonDocHistoryScan(path)
}

private[sources] object JsonDocHistoryTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    // the OPERATION that minted the snapshot (r14 — append / overwrite /
    // rewrite / merge-on-read <cmd> / optimize / rollback /
    // stream-append / bootstrap); NULL for pre-r14 manifests
    StructField("op", org.apache.spark.sql.types.StringType, nullable = true),
    StructField("n_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    // commit time, epoch millis (the TIMESTAMP AS OF resolution basis —
    // surfacing it makes "read as of last Monday" auditable before the
    // fact); NULL only for a manifest missing mid-scan
    StructField("committed_ms", LongType, nullable = true),
    // write-audit-publish (r14): true = a staged snapshot, invisible to
    // current reads until `CALL publish`
    StructField("staged", org.apache.spark.sql.types.BooleanType, nullable = false)))
}

private[sources] case class JsonDocHistoryPartition(
  rows: Seq[(Long, Option[String], Long, Option[Long], Option[Long], Boolean)]) extends InputPartition

private[sources] class JsonDocHistoryScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = JsonDocHistoryTable.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val stats = JsonDocStats.load(path)
    val rows = JsonDocVersions.manifests(path).toSeq.map { v =>
      val files = JsonDocVersions.read(path, v).getOrElse(Set.empty)
      // rows = -1 is parseFile's missing-field sentinel — same NULL
      // conservatism as a missing entry (estimateStatistics' guard)
      val per = files.toSeq.map(n => stats.get(n).map(_.rows).filter(_ >= 0))
      // this VERSION's delete vectors subtract exactly (r14): history
      // reports live rows as of each snapshot, not raw file contents
      lazy val dvDeleted = JsonDocVersions.readDvs(path, v).values
        .map(dv => JsonDocDeleteVectors.read(path, dv).size.toLong).sum
      // equality deletes (r15) cannot subtract without reading — a
      // version carrying any withdraws its count (NULL), the sidecar's
      // standing conservatism (estimateStatistics applies the same rule)
      lazy val hasEqs = JsonDocVersions.state(path, v).exists(_.eqs.nonEmpty)
      val nRows = if (per.nonEmpty && per.forall(_.isDefined) && !hasEqs)
        Some(per.flatten.sum - dvDeleted)
        else if (files.isEmpty) Some(0L)
        else None
      (v.toLong, JsonDocVersions.readOp(path, v), files.size.toLong, nRows,
        JsonDocVersions.mtime(path, v), JsonDocVersions.readStaged(path, v))
    }
    Array(JsonDocHistoryPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[JsonDocHistoryPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (v, op, nf, nr, ms, st) = it.next()
        cur = InternalRow(v,
          op.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull,
          nf, nr.map(Long.box).orNull, ms.map(Long.box).orNull, st)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def description(): String = s"graft-jsondoc history path=$path"
}

/** The `path#files` metadata table ([[GraftCatalog.loadTable]]) —
  * Iceberg's `t.files` idiom, path-addressed: one row per LIVE data
  * file of the current snapshot —
  *
  *   `(file STRING, n_bytes BIGINT, n_rows BIGINT NULLABLE,
  *     bounds MAP<STRING, STRING> NULLABLE)`
  *
  * `n_rows` and `bounds` come from the stats sidecar (`bounds` keys are
  * `<col>.min` / `<col>.max`, values rendered as strings so one map
  * carries every supported type); both are NULL for a file without an
  * entry — the same conservatism as `#history.n_rows`. Like history,
  * the listing is computed driver-side at scan planning: a table's
  * live-file inventory is manifest-sized, never data-sized. This is
  * the user-visible window onto exactly the metadata that file
  * skipping and the exact-numRows statistic run on, so a query over it
  * (q184) pins sidecar integrity across multi-commit sequences.
  * `VERSION AS OF v` pins the inventory to snapshot v — retired files
  * keep their sidecar entries precisely so this stays computable. */
private[sources] class JsonDocFilesTable(path: String,
    pinned: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-jsondoc($path${pinned.map(v => s"@v$v").getOrElse("")}#files)"
  override def schema(): StructType = JsonDocFilesTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new JsonDocFilesScan(path, pinned)
}

private[sources] object JsonDocFilesTable {
  val Schema: StructType = StructType(Seq(
    StructField("file", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    // merge-on-read observability (r14): positions delete-vectored out
    // of this file under the scanned snapshot — Σ(n_deleted)/Σ(n_rows)
    // is the "time to OPTIMIZE" signal a MOR table is steered by
    StructField("n_deleted", LongType, nullable = false),
    StructField("bounds", org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType), nullable = true)))
}

private[sources] case class JsonDocFilesPartition(
  rows: Seq[(String, Long, Option[Long], Long, Option[Map[String, String]])])
  extends InputPartition

private[sources] class JsonDocFilesScan(path: String,
    pinned: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = JsonDocFilesTable.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val stats = JsonDocStats.load(path)
    // live rows per file under THIS snapshot = sidecar rows minus its
    // delete-vector positions (exact; r14)
    val dvCounts = JsonDocDeleteVectors.countsFor(path, pinned)
    // a file with APPLICABLE equality deletes (r15) has an unknowable
    // live count without reading — its n_rows reads NULL (the standing
    // conservatism); files the eqs don't reach stay exact
    val (eqs, addedAt) = JsonDocVersions.eqsFor(path, pinned)
    def eqTouched(rel: String): Boolean =
      eqs.nonEmpty && eqs.exists(_._1 > addedAt.getOrElse(rel, Int.MaxValue))
    val rows = JsonDocSource.listDataFiles(path, pinned).toSeq.map { f =>
      val rel = JsonDocSource.relName(path, f)
      val entry = stats.get(rel)
      val bounds = entry.map(_.cols.flatMap { case (c, r) =>
        Seq(s"$c.min" -> String.valueOf(r.min), s"$c.max" -> String.valueOf(r.max))
      })
      // rows = -1 (parseFile's missing-field sentinel) reads NULL, the
      // documented conservatism — never a negative "exact" count
      (rel, f.length(),
        entry.map(_.rows).filter(_ >= 0).map(_ - dvCounts.getOrElse(rel, 0L))
          .filterNot(_ => eqTouched(rel)),
        dvCounts.getOrElse(rel, 0L), bounds)
    }
    Array(JsonDocFilesPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[JsonDocFilesPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (name, bytes, nr, nDel, bounds) = it.next()
        val mapData = bounds.map { m =>
          val ks = m.keys.toArray.sorted
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            ks.map(org.apache.spark.unsafe.types.UTF8String.fromString(_): Any),
            ks.map(k => org.apache.spark.unsafe.types.UTF8String.fromString(m(k)): Any))
        }.orNull
        cur = InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(name),
          bytes, nr.map(Long.box).orNull, nDel, mapData)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def description(): String = s"graft-jsondoc files path=$path"
}

/** The `path#partitions` metadata table ([[GraftCatalog.loadTable]]) —
  * Iceberg's `t.partitions` idiom: one row per live PARTITION DIRECTORY
  * of the current snapshot —
  *
  *   `(partition STRING, n_files BIGINT, n_bytes BIGINT,
  *     n_rows BIGINT NULLABLE)`
  *
  * `partition` is the relative directory prefix (`"lang=en"`,
  * `"a=1/b=x"`; `""` for an unpartitioned table's root — the whole
  * table is then one row, which is the honest degenerate case rather
  * than an error). `n_rows` sums the stats sidecar and is NULL if any
  * file of the partition lacks an entry — `#history`'s conservatism at
  * partition grain. Driver-side at plan time: a partition inventory is
  * directory-count-sized, never data-sized. SHOW PARTITIONS, the
  * skew census (which partition ate the table), and retention
  * decisions all read from this one surface. */
private[sources] class JsonDocPartitionsTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsondoc($path#partitions)"
  override def schema(): StructType = JsonDocPartitionsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new JsonDocPartitionsScan(path)
}

private[sources] object JsonDocPartitionsTable {
  val Schema: StructType = StructType(Seq(
    StructField("partition", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true)))
}

private[sources] case class JsonDocPartitionsPartition(
  rows: Seq[(String, Long, Long, Option[Long])]) extends InputPartition

private[sources] class JsonDocPartitionsScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = JsonDocPartitionsTable.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val stats = JsonDocStats.load(path)
    val dvCounts = JsonDocDeleteVectors.countsFor(path, None)
    val rows = JsonDocSource.listDataFiles(path).toSeq
      .map(f => (f, JsonDocSource.relName(path, f)))
      .groupBy { case (_, rel) =>
        val cut = rel.lastIndexOf('/')
        if (cut < 0) "" else rel.substring(0, cut)
      }
      .toSeq.sortBy(_._1)
      .map { case (part, files) =>
        val per = files.map { case (_, rel) =>
          stats.get(rel).map(_.rows).filter(_ >= 0)
            .map(_ - dvCounts.getOrElse(rel, 0L)) } // live rows (r14)
        val nRows = if (per.forall(_.isDefined)) Some(per.flatten.map(identity).sum)
          else None
        (part, files.size.toLong, files.map(_._1.length()).sum, nRows)
      }
    Array(JsonDocPartitionsPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[JsonDocPartitionsPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (p, nf, nb, nr) = it.next()
        cur = InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(p),
          nf, nb, nr.map(Long.box).orNull)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def description(): String = s"graft-jsondoc partitions path=$path"
}

/** The `path#refs` metadata table (r14) — Iceberg's `t.refs` idiom:
  * one row per named ref —
  *
  *   `(name STRING, type STRING, version BIGINT)`
  *
  * `type` is always `'tag'` today (branches — writable refs — are not
  * implemented); the column exists so the schema is already right when
  * they are. Driver-computed at planning like the other metadata
  * tables: a ref listing is tag-count-sized. */
private[sources] class JsonDocRefsTable(path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-jsondoc($path#refs)"
  override def schema(): StructType = JsonDocRefsTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new JsonDocRefsScan(path)
}

private[sources] object JsonDocRefsTable {
  val Schema: StructType = StructType(Seq(
    StructField("name", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("type", org.apache.spark.sql.types.StringType, nullable = false),
    StructField("version", LongType, nullable = false)))
}

private[sources] case class JsonDocRefsPartition(
  rows: Seq[(String, String, Long)]) extends InputPartition

private[sources] class JsonDocRefsScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = JsonDocRefsTable.Schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(JsonDocRefsPartition(
      (JsonDocRefs.tags(path).toSeq.map { case (n, v) => (n, "tag", v.toLong) } ++
        // branch version = the chain's HEAD (0 = created, no commits yet)
        JsonDocRefs.branches(path).toSeq.map { case (n, v) => (n, "branch", v.toLong) })
        .sortBy(r => (r._1, r._2))))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[JsonDocRefsPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val (n, tpe, v) = it.next()
        cur = InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(n),
          org.apache.spark.unsafe.types.UTF8String.fromString(tpe), v)
        true
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def description(): String = s"graft-jsondoc refs path=$path"
}
