package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** SNAPSHOT VERSIONING for jsondoc directories — the manifest layer that
  * turns the table into a small MVCC store (the Iceberg/Delta commit
  * model re-expressed at file granularity):
  *
  *  - every V2 commit writes `_manifest_v<N>.json` naming the LIVE data
  *    files of version N; the manifest creation is the atomic commit
  *    point (data-file renames happen first, so a manifest only ever
  *    references files that exist);
  *  - data files are IMMUTABLE once committed — truncate and
  *    copy-on-write replacement RETIRE files from the next manifest
  *    instead of deleting them, so a concurrent reader planned against
  *    version N keeps reading N's files mid-query while a writer
  *    commits N+1 (snapshot isolation), and any past version stays
  *    queryable (`VERSION AS OF` / `TIMESTAMP AS OF`);
  *  - disk is reclaimed explicitly by [[GraftCatalog.vacuum]], which
  *    drops manifests older than the kept window and deletes data files
  *    no kept manifest references.
  *
  * All storage I/O goes through the [[CommitStore]] seam (r14): local FS
  * by default, a conditional-put object store in a cloud deployment, an
  * in-memory race-injecting fake in CommitStoreSpec.
  *
  * Directories never written by the V2 writer have no manifests and
  * keep the legacy rule (every visible file is live) — hand-staged
  * fixture dirs and foreign writers are unaffected. */
private[graft] object JsonDocVersions {
  private val Prefix = "_manifest_v"
  private val Suffix = ".json"

  /** The storage seam; tests swap in the in-memory racing fake (always
    * restored in a finally — the default is the local filesystem). */
  @volatile private[graft] var store: CommitStore = LocalFsCommitStore

  def manifestName(v: Int): String = f"$Prefix$v%06d$Suffix"

  /** All committed manifest versions in the directory, ascending. */
  def manifests(path: String): Array[Int] =
    store.list(path).flatMap { n =>
      if (n.startsWith(Prefix) && n.endsWith(Suffix))
        n.stripPrefix(Prefix).stripSuffix(Suffix).toIntOption
      else None
    }.toArray.sorted

  /** Commit time of version v (epoch millis). */
  def mtime(path: String, v: Int): Option[Long] =
    store.mtime(path, manifestName(v))

  /** Drop version v's manifest (vacuum/expire only). */
  def deleteManifest(path: String, v: Int): Boolean =
    store.delete(path, manifestName(v))

  private def readNode(path: String, v: Int): Option[com.fasterxml.jackson.databind.JsonNode] =
    store.read(path, manifestName(v)).map(new ObjectMapper().readTree(_))

  def read(path: String, v: Int): Option[Set[String]] =
    readNode(path, v).flatMap(node =>
      Option(node.get("files")).map(_.elements().asScala.map(_.asText()).toSet))

  /** Is version v a STAGED (write-audit-publish) snapshot? Staged
    * snapshots live in the same numbered chain but are INVISIBLE to
    * every current-read surface ([[latestVersion]] skips them) until
    * `CALL publish` re-applies their delta as a published commit. */
  def readStaged(path: String, v: Int): Boolean =
    readNode(path, v).flatMap(node =>
      Option(node.get("staged")).map(_.asBoolean())).getOrElse(false)

  /** The PUBLISHED version a staged snapshot was written against — the
    * base `publish` computes its delta from. 0 = staged onto an empty
    * table. None for non-staged manifests. */
  def readParent(path: String, v: Int): Option[Int] =
    readNode(path, v).flatMap(node =>
      Option(node.get("parent")).map(_.asInt()))

  /** Greatest PUBLISHED (non-staged) version — the basis of every
    * current read, current-write rebase, and ledger lookup. The common
    * case (last manifest unstaged) costs the same single read as
    * before; a staged head walks back until a published one. */
  def latestVersion(path: String): Option[Int] =
    manifests(path).reverse.find(v => !readStaged(path, v))

  /** The DELETE-VECTOR map of version v: `live data file -> DV file
    * name` (r14, merge-on-read). A DV names the row POSITIONS of its
    * data file that are deleted as of this version; readers fold it at
    * scan. DV files are immutable like data files — a further MOR
    * delete writes a NEW DV holding the union and repoints the map — so
    * time travel reads each version's own deletion state. Files without
    * an entry have no deletes. */
  def readDvs(path: String, v: Int): Map[String, String] =
    readNode(path, v).flatMap(node => Option(node.get("dvs")).map { t =>
      t.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }).getOrElse(Map.empty)

  /** DV map to read under: pinned version's, else the latest
    * PUBLISHED version's (a staged head's DVs are invisible until
    * publish, like its files). */
  def dvsFor(path: String, pinned: Option[Int]): Map[String, String] =
    pinned.orElse(latestVersion(path)) match {
      case Some(v) => readDvs(path, v)
      case None => Map.empty
    }

  /** One compaction's provenance record (r14, verdict item 5): the
    * output file's exact input set, and whether delete vectors were
    * APPLIED while concatenating (`purged`) — the bit that decides
    * whether a checkpointed consumer may treat the output as the sum of
    * its inputs. */
  final case class Rewrite(from: Set[String], purged: Boolean)

  /** The REWRITE records of version v: `output -> Rewrite` — present
    * only in versions minted by OPTIMIZE (a per-version event record,
    * never carried forward). Lets a checkpointed streaming consumer
    * REBASE across compaction: an output all of whose inputs were
    * already consumed is itself fully consumed and skippable, instead
    * of today's abort-and-reingest. */
  def readRewrites(path: String, v: Int): Map[String, Rewrite] =
    readNode(path, v).flatMap(node => Option(node.get("rewrites")).map { r =>
      r.fields().asScala.map { e =>
        val from = Option(e.getValue.get("from"))
          .map(_.elements().asScala.map(_.asText()).toSet).getOrElse(Set.empty[String])
        val purged = Option(e.getValue.get("purged")).exists(_.asBoolean())
        e.getKey -> Rewrite(from, purged)
      }.toMap
    }).getOrElse(Map.empty)

  /** The APPLIED-TRANSACTION map of version v: `appId -> last applied
    * version` (the Delta `txnAppId`/`txnVersion` idiom). Carried
    * FORWARD by every commit and updated atomically WITH the live-set
    * claim, so "was epoch e of app a already folded into this table?"
    * is answered by the same artifact that made the fold visible — no
    * external ledger, no crash window between data commit and ledger
    * write (r12 verdict item 1). */
  def readTxns(path: String, v: Int): Map[String, Long] =
    readNode(path, v).flatMap(node => Option(node.get("txns")).map { t =>
      t.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    }).getOrElse(Map.empty)

  /** Latest applied version for `appId`, from the latest PUBLISHED
    * manifest — the ledger answers against published state (None: no
    * manifest, or the app never committed a transaction). */
  def lastTxn(path: String, appId: String): Option[Long] =
    latestVersion(path).flatMap(v => readTxns(path, v).get(appId))

  /** Latest PUBLISHED snapshot (staged WAP heads are invisible). */
  def latest(path: String): Option[(Int, Set[String])] =
    latestVersion(path).flatMap(v => read(path, v).map(v -> _))

  /** Greatest PUBLISHED version whose manifest was committed at or
    * before `tsMillis` (TIMESTAMP AS OF resolution via manifest commit
    * times). Staged snapshots are not on the table's timeline; explicit
    * VERSION AS OF by number or tag still reads them (the audit read). */
  def resolveAt(path: String, tsMillis: Long): Option[Int] =
    manifests(path).filter(v => !readStaged(path, v) &&
      mtime(path, v).exists(_ <= tsMillis)).lastOption

  /** The OPERATION that minted version v (r14 — Delta's commitInfo
    * idiom at one-word grain): "append", "overwrite", "rewrite" (COW
    * DML), "merge-on-read <cmd>", "optimize", "rollback",
    * "stream-append", "bootstrap". None for pre-r14 manifests. */
  def readOp(path: String, v: Int): Option[String] =
    readNode(path, v).flatMap(node => Option(node.get("op")).map(_.asText()))

  private def manifestJson(v: Int, newLive: Set[String],
      txns: Map[String, Long], dvs: Map[String, String],
      rewrites: Map[String, Rewrite] = Map.empty, op: String = "",
      stagedParent: Option[Int] = None): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", v)
    if (op.nonEmpty) root.put("op", op)
    stagedParent.foreach { p =>
      root.put("staged", true)
      root.put("parent", p)
    }
    val arr = root.putArray("files")
    newLive.toSeq.sorted.foreach(arr.add)
    if (txns.nonEmpty) {
      val t = root.putObject("txns")
      txns.toSeq.sortBy(_._1).foreach { case (app, ver) => t.put(app, ver) }
    }
    if (dvs.nonEmpty) {
      val d = root.putObject("dvs")
      dvs.toSeq.sortBy(_._1).foreach { case (f, dv) => d.put(f, dv) }
    }
    if (rewrites.nonEmpty) {
      val r = root.putObject("rewrites")
      rewrites.toSeq.sortBy(_._1).foreach { case (out, rw) =>
        val o = r.putObject(out)
        val fr = o.putArray("from")
        rw.from.toSeq.sorted.foreach(fr.add)
        o.put("purged", rw.purged)
      }
    }
    mapper.writeValueAsString(root)
  }

  /** DV carry-forward rule, shared by both commit paths: prior entries
    * survive only while their data file stays live (a retired/truncated
    * file's deletions died with it), then this commit's updates apply —
    * also live-filtered, so an update raced away by a rewrite can never
    * resurrect a dropped file's entry. */
  private def carryDvs(prevDvs: Map[String, String],
      updates: Map[String, String], newLive: Set[String]): Map[String, String] =
    (prevDvs ++ updates).filter { case (f, _) => newLive.contains(f) }

  /** Write version latest+1 naming `newLive` ABSOLUTELY; atomic CAS
    * claim through the store. Returns the committed version. A
    * concurrent commit between the latest-read and the claim throws
    * ConcurrentModificationException — an absolute set computed against
    * a stale base cannot be rebased here (the caller does not say what
    * it added or removed); retryable callers use [[commitDelta]], which
    * rebases and retries itself. */
  /** `dvsOverride` (r14, rollback): the delete-vector map to commit
    * VERBATIM (live-filtered) instead of carrying the latest version's
    * forward — a rollback must restore the target version's deletion
    * state exactly, not the current one filtered to old files. */
  def commit(path: String, newLive: Set[String],
      txn: Option[(String, Long)] = None,
      dvsOverride: Option[Map[String, String]] = None,
      op: String = ""): Int = {
    // version numbering covers the WHOLE chain (CAS on names); txn/DV
    // carry-forward reads the latest PUBLISHED basis (staged WAP heads
    // contribute nothing to published state)
    val v = manifests(path).lastOption.getOrElse(0) + 1
    val prev = latestVersion(path)
    val txns = prev.map(readTxns(path, _)).getOrElse(Map.empty) ++ txn
    val dvs = dvsOverride match {
      case Some(o) => o.filter { case (f, _) => newLive.contains(f) }
      case None => carryDvs(prev.map(readDvs(path, _)).getOrElse(Map.empty),
        Map.empty, newLive)
    }
    if (!store.putIfAbsent(path, manifestName(v),
      manifestJson(v, newLive, txns, dvs, op = op)))
      throw new java.util.ConcurrentModificationException(
        s"graft-jsondoc: manifest v$v of $path was committed concurrently — " +
          "this absolute commit cannot rebase; re-read the table and retry")
    v
  }

  /** DELTA commit with optimistic-concurrency RETRY (r13): the new live
    * set is `(latest -- removed) ++ added`, recomputed from the CURRENT
    * latest on every attempt, so a racing append never loses its files
    * to this commit and vice versa. Every `removed` name must still be
    * live — a concurrent rewrite that already retired one means the two
    * commits derived from the same file contents and merging them would
    * duplicate rows (the copy-on-write conflict Delta/Iceberg also
    * refuse): ConcurrentModificationException, caller re-plans. When
    * the delta is a no-op and no transaction needs recording, no
    * version is minted (idempotent streaming replays). */
  /** `dvBasis`: the delete-vector map a REWRITE read its inputs under
    * (r14). A rewrite's outputs bake in the deletions it folded at scan;
    * if a concurrent MOR delete repointed an input's DV since, retiring
    * that input would silently RESURRECT the newly-deleted rows in the
    * rewritten output — so any drift between basis and current on a
    * `removed` file is a conflict, same family as the retired-file
    * check. None (non-rewrite callers) skips the check. */
  def commitDelta(path: String, removed: Set[String], added: Set[String],
      txn: Option[(String, Long)] = None,
      dvUpdates: Map[String, String] = Map.empty,
      dvBasis: Option[Map[String, String]] = None,
      rewrites: Map[String, Rewrite] = Map.empty,
      op: String = "",
      staged: Boolean = false,
      stagedBase: Option[Int] = None): Int = {
    var attempt = 0
    while (true) {
      // numbering over the whole chain; the REBASE BASE is the latest
      // PUBLISHED version — a current write must never absorb a staged
      // head's files into the visible live set (WAP invisibility), and
      // a STAGED write bases on published state too (each staged
      // snapshot is an independent candidate off the current table) —
      // UNLESS it extends a BRANCH (r14): `stagedBase` = the branch's
      // staged head, so successive branch writes build on each other
      val v = manifests(path).lastOption.getOrElse(0) + 1
      val prev = stagedBase.filter(_ > 0).orElse(latestVersion(path))
      // an unreadable LATEST manifest must abort, not silently rebase
      // onto an empty set — that would commit a live set holding only
      // this delta's additions and drop the whole table
      val base = prev match {
        case Some(pv) => read(path, pv).getOrElse(
          throw new java.io.IOException(
            s"graft-jsondoc: latest manifest v$pv of $path is unreadable — refusing to commit over it"))
        case None => Set.empty[String]
      }
      val missing = removed -- base
      if (missing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"graft-jsondoc: commit to $path retires files no longer live " +
            s"(${missing.take(3).mkString(", ")}) — a concurrent rewrite won; re-plan")
      // a DV targeting a no-longer-live file is the same conflict: the
      // positions were derived from contents a concurrent rewrite has
      // since replaced — applying them to nothing silently un-deletes
      val dvMissing = dvUpdates.keySet -- base
      if (dvMissing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"graft-jsondoc: commit to $path carries delete vectors for files no longer " +
            s"live (${dvMissing.take(3).mkString(", ")}) — a concurrent rewrite won; re-plan")
      val newLive = (base -- removed) ++ added
      val txns = prev.map(readTxns(path, _)).getOrElse(Map.empty)
      val prevDvs = prev.map(readDvs(path, _)).getOrElse(Map.empty)
      dvBasis.foreach { basis =>
        // retired files AND files whose DV this commit repoints: either
        // way the commit's content was derived under `basis`, so a DV
        // that moved since means concurrent deletes this commit would
        // silently resurrect (r14; dvUpdates leg added for publish —
        // a staged MOR delete's union was computed against its parent)
        val drifted = (removed ++ dvUpdates.keySet)
          .filter(f => prevDvs.get(f) != basis.get(f))
        if (drifted.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"graft-jsondoc: commit to $path touches files whose delete vectors " +
              s"changed since it read them (${drifted.take(3).mkString(", ")}) " +
              "— committing would resurrect the concurrent deletes; re-plan")
      }
      val dvs = carryDvs(prevDvs, dvUpdates, newLive)
      if (!staged && newLive == base && dvs == prevDvs &&
        txn.forall { case (a, e) => txns.get(a).contains(e) })
        return prev.getOrElse(0)
      if (store.putIfAbsent(path, manifestName(v),
        manifestJson(v, newLive, txns ++ txn, dvs, rewrites, op,
          stagedParent = if (staged) Some(prev.getOrElse(0)) else None)))
        return v
      attempt += 1
      if (attempt > 100)
        throw new java.io.IOException(
          s"graft-jsondoc: gave up committing to $path after $attempt collisions")
    }
    -1 // unreachable
  }

  /** The live-file set to read: pinned version (STRICT — a vacuumed or
    * unknown version throws rather than silently returning partial
    * data), else the latest manifest, else None = legacy directory. */
  def liveSet(path: String, pinned: Option[Int]): Option[Set[String]] =
    pinned match {
      case Some(v) =>
        val files = read(path, v).getOrElse(throw new IllegalArgumentException(
          s"graft-jsondoc: version $v of $path does not exist (never committed, or vacuumed)"))
        files.find(n => !new java.io.File(path, n).isFile).foreach { missing =>
          throw new IllegalStateException(
            s"graft-jsondoc: version $v of $path is no longer readable — $missing was vacuumed")
        }
        Some(files)
      case None => latest(path).map(_._2)
    }
}

/** Driver-side registry of the PENDING transaction id for a table path:
  * SQL commands (`MERGE INTO t ...`) have no writer-options channel, so
  * an idempotent applier declares "the write I am about to run IS epoch
  * e of app a" here, and [[JsonDocBatchWrite]]'s commit folds it into
  * the manifest claim — the ONE atomic point. Begin before the
  * command, clear in a finally (the commit itself consumes the entry on
  * success, so the finally only matters on failure). Keys are
  * canonical paths; one pending transaction per table at a time
  * (`begin` refuses a second, spec-pinned).
  *
  * MULTI-WRITER CONTRACT (r14, stated precisely): this registry is
  * PER-JVM. Across processes, the manifest CAS still fully protects the
  * LIVE SET (racing commits rebase or abort; no file is ever lost), and
  * a crash-and-retry of ONE applier is exactly-once (check `lastTxn`,
  * apply, commit folds the epoch atomically — replay sees the epoch and
  * skips). What per-JVM state canNOT protect is TWO CONCURRENT appliers
  * of the same (table, appId): both read `lastTxn` before either
  * commits, both apply, and the fold lands twice — the check-then-apply
  * window. Closing it needs the claim to happen at CHECK time, i.e. a
  * begin-token CAS in the store (`putIfAbsent` of a lock entry naming
  * (appId, epoch), swept on commit) — mechanical to add on the
  * [[CommitStore]] seam, not built because the engine's own appliers
  * (the q183/q188 MV folds) are checkpointed streams, which Spark
  * already constrains to one active run per checkpoint. Run ONE applier
  * process per (table, appId); anything else is outside the contract. */
private[graft] object GraftTxn {
  private val pending = new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  private def key(path: String): String =
    try new java.io.File(path).getCanonicalPath
    catch { case _: java.io.IOException => new java.io.File(path).getAbsolutePath }

  def begin(path: String, appId: String, version: Long): Unit = {
    val prev = pending.putIfAbsent(key(path), (appId, version))
    require(prev == null,
      s"graft-jsondoc: a transaction is already pending on $path ($prev) — " +
        "commit or clear it before beginning another")
  }

  /** Consume (commit-time). */
  def take(path: String): Option[(String, Long)] = Option(pending.remove(key(path)))

  /** Failure-path cleanup; idempotent. */
  def clear(path: String): Unit = pending.remove(key(path))

  /** Test hook: is a transaction pending for this path? */
  private[graft] def isPending(path: String): Boolean = pending.containsKey(key(path))
}
