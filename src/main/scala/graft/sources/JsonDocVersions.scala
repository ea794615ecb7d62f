package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** SNAPSHOT VERSIONING for jsondoc directories — the manifest layer that
  * turns the table into a small MVCC store (the Iceberg/Delta commit
  * model re-expressed at file granularity):
  *
  *  - every V2 commit writes `_manifest_v<N>.json` naming the LIVE data
  *    files of version N; the manifest rename is the atomic commit
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
  * Directories never written by the V2 writer have no manifests and
  * keep the legacy rule (every visible file is live) — hand-staged
  * fixture dirs and foreign writers are unaffected. */
private[graft] object JsonDocVersions {
  private val Prefix = "_manifest_v"
  private val Suffix = ".json"

  def manifestName(v: Int): String = f"$Prefix$v%06d$Suffix"

  /** All manifests in the directory, version-ascending. */
  def manifests(path: String): Array[(Int, java.io.File)] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        val n = f.getName
        if (f.isFile && n.startsWith(Prefix) && n.endsWith(Suffix))
          n.stripPrefix(Prefix).stripSuffix(Suffix).toIntOption.map(_ -> f)
        else None
      }
      .sortBy(_._1)

  def read(path: String, v: Int): Option[Set[String]] = {
    val f = new java.io.File(path, manifestName(v))
    if (!f.isFile) None
    else {
      val node = new ObjectMapper().readTree(f)
      Option(node.get("files")).map(_.elements().asScala.map(_.asText()).toSet)
    }
  }

  /** The APPLIED-TRANSACTION map of version v: `appId -> last applied
    * version` (the Delta `txnAppId`/`txnVersion` idiom). Carried
    * FORWARD by every commit and updated atomically WITH the live-set
    * rename, so "was epoch e of app a already folded into this table?"
    * is answered by the same artifact that made the fold visible — no
    * external ledger, no crash window between data commit and ledger
    * write (r12 verdict item 1). */
  def readTxns(path: String, v: Int): Map[String, Long] = {
    val f = new java.io.File(path, manifestName(v))
    if (!f.isFile) return Map.empty
    val node = new ObjectMapper().readTree(f)
    Option(node.get("txns")).map { t =>
      t.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    }.getOrElse(Map.empty)
  }

  /** Latest applied version for `appId`, from the latest manifest
    * (None: no manifest, or the app never committed a transaction). */
  def lastTxn(path: String, appId: String): Option[Long] =
    manifests(path).lastOption.flatMap { case (v, _) => readTxns(path, v).get(appId) }

  def latest(path: String): Option[(Int, Set[String])] =
    manifests(path).lastOption.flatMap { case (v, _) => read(path, v).map(v -> _) }

  /** Greatest version whose manifest was committed at or before
    * `tsMillis` (TIMESTAMP AS OF resolution via manifest mtimes). */
  def resolveAt(path: String, tsMillis: Long): Option[Int] =
    manifests(path).filter(_._2.lastModified() <= tsMillis).lastOption.map(_._1)

  /** Write version latest+1 naming `newLive`; atomic tmp+rename.
    * Returns the committed version. Callers skip the call when the live
    * set is unchanged (idempotent streaming replays) — EXCEPT when a
    * transaction must be recorded, which is why the batch commit never
    * skips. `txn` (appId -> applied version) is folded into the
    * carried-forward txn map INSIDE the same atomic rename. */
  def commit(path: String, newLive: Set[String],
      txn: Option[(String, Long)] = None): Int = {
    val prev = manifests(path).lastOption
    val v = prev.map(_._1).getOrElse(0) + 1
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", v)
    val arr = root.putArray("files")
    newLive.toSeq.sorted.foreach(arr.add)
    val txns = prev.map { case (pv, _) => readTxns(path, pv) }.getOrElse(Map.empty) ++ txn
    if (txns.nonEmpty) {
      val t = root.putObject("txns")
      txns.toSeq.sortBy(_._1).foreach { case (app, ver) => t.put(app, ver) }
    }
    val tmp = new java.io.File(path, s".${manifestName(v)}.tmp")
    // explicit UTF-8: FileWriter would use the platform charset while
    // every reader parses UTF-8 — a non-UTF-8 locale would mangle
    // non-ASCII names/bounds into '?' (advice r12)
    java.nio.file.Files.writeString(tmp.toPath, mapper.writeValueAsString(root))
    val dst = new java.io.File(path, manifestName(v))
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"manifest commit rename failed in $path")
    v
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
  * the manifest rename — the ONE atomic point. Begin before the
  * command, clear in a finally (the commit itself consumes the entry on
  * success, so the finally only matters on failure). Keys are
  * canonical paths; one pending transaction per table at a time —
  * concurrent SQL writers to one local-FS table are already outside
  * this source's single-writer contract. */
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
