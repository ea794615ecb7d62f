package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** SNAPSHOT VERSIONING for jsondoc directories — the manifest layer that
  * turns the table into a small MVCC store (the Iceberg/Delta commit
  * model re-expressed at file granularity):
  *
  *  - every V2 commit writes `_manifest_v<N>.json`; the manifest
  *    creation is the atomic commit point (data-file renames happen
  *    first, so a manifest only ever references files that exist);
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
  * INCREMENTAL MANIFESTS (r15, the r14 verdict's top item — the Delta
  * Lake log/checkpoint split re-expressed): a delta commit no longer
  * writes the full live set. Each `_manifest_v<N>.json` is now a DELTA
  * RECORD — `{base: B, add: [...], remove: [...], dvSet: {...},
  * txnSet: {...}}` — whose size is O(changed files), FLAT as the table
  * grows; the snapshot state at N is reconstructed by walking `base`
  * pointers back to the nearest self-contained basis and folding
  * forward. Three mechanisms bound the walk and the resolution cost:
  *
  *  - **Checkpoints**: every [[CkptEvery]] commits the committer also
  *    writes `_ckpt_v<N>.json` — the FULL state (live files, DV map,
  *    txn ledger, added-at map) — as a best-effort sidecar (a crash
  *    before it merely lengthens one walk). Reconstruction cost is
  *    therefore O(CkptEvery) manifest reads, not O(versions).
  *  - **Head pointer**: `_head.json` names the newest committed version
  *    (best-effort overwrite after every commit). Resolution reads it
  *    and probes FORWARD for any newer manifests the pointer missed —
  *    O(1 + lag) existence checks instead of listing the whole manifest
  *    directory (Delta's `_last_checkpoint` idiom: may lag, never
  *    lies). A stale-or-missing pointer falls back to the listing.
  *  - **State cache**: manifests are immutable once written, so
  *    reconstructed states memoize per (store, path, version) in a
  *    bounded LRU; repeated resolution of a hot table is pure cache.
  *
  * ABSOLUTE manifests (`{"files": [...]}` — bootstrap, rollback, and
  * every pre-r15 manifest) remain valid and self-contained: the old
  * format is simply "every manifest is a checkpoint", so legacy
  * directories read unchanged.
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
  private val HeadName = "_head.json"
  private val CkptPrefix = "_ckpt_v"

  /** Commits between full-state checkpoint sidecars: walk-back length
    * (and so snapshot-resolution reads) is bounded by this. 16 balances
    * per-commit metadata bytes (one ckpt per 16 commits) against
    * resolution cost; ManifestScaleSpec pins both sides. */
  private[sources] val CkptEvery = 16

  /** The storage seam; tests swap in the in-memory racing fake (always
    * restored in a finally — the default is the local filesystem). */
  @volatile private[graft] var store: CommitStore = LocalFsCommitStore

  def manifestName(v: Int): String = f"$Prefix$v%06d$Suffix"
  private def ckptName(v: Int): String = f"$CkptPrefix$v%06d$Suffix"

  // ---------------------------------------------------------------- state

  /** The reconstructed snapshot state of one version. `addedAt` maps
    * each live file to the version that ADDED it (the per-file sequence
    * number equality deletes apply against: an equality delete written
    * at version E hits only files with addedAt < E). `eqs` is the
    * ordered list of live equality-delete files as (version, name).
    * `depth` = delta hops to the nearest self-contained basis (drives
    * checkpoint cadence). */
  private[sources] final case class TableState(
      live: Set[String],
      dvs: Map[String, String],
      txns: Map[String, Long],
      addedAt: Map[String, Int],
      eqs: Seq[(Int, String)],
      depth: Int)

  private[sources] val EmptyState =
    TableState(Set.empty, Map.empty, Map.empty, Map.empty, Seq.empty, 0)

  /** Bounded memo of immutable artifacts, keyed by store identity so a
    * test-swapped fake never reads a prior store's entries. Entries are
    * invalidated on [[deleteManifest]] (discarded stages can free a
    * version NUMBER for re-use by the next commit). */
  private final class Lru[V](max: Int) {
    private val m = new java.util.LinkedHashMap[(Int, String, Int), V](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(Int, String, Int), V]): Boolean = size() > max
    }
    def get(k: (Int, String, Int)): Option[V] = m.synchronized(Option(m.get(k)))
    def put(k: (Int, String, Int), v: V): Unit = m.synchronized { m.put(k, v); () }
    def drop(k: (Int, String, Int)): Unit = m.synchronized { m.remove(k); () }
  }
  private val nodeCache = new Lru[JsonNode](256)
  private val stateCache = new Lru[TableState](64)
  private def cacheKey(path: String, v: Int): (Int, String, Int) =
    (System.identityHashCode(store), path, v)

  /** All committed manifest versions in the directory, ascending — the
    * LISTING path, for maintenance surfaces that are O(versions) by
    * nature (vacuum, expiry, #history, TIMESTAMP AS OF). Hot read/write
    * paths resolve through [[latestManifestVersion]] instead. */
  def manifests(path: String): Array[Int] =
    store.list(path).flatMap { n =>
      if (n.startsWith(Prefix) && n.endsWith(Suffix))
        n.stripPrefix(Prefix).stripSuffix(Suffix).toIntOption
      else None
    }.toArray.sorted

  /** Commit time of version v (epoch millis). */
  def mtime(path: String, v: Int): Option[Long] =
    store.mtime(path, manifestName(v))

  /** Drop version v's manifest (vacuum/expire/discard only) and its
    * checkpoint sidecar; invalidates the caches so a later commit that
    * re-uses the number never reads the dead entry. */
  def deleteManifest(path: String, v: Int): Boolean = {
    nodeCache.drop(cacheKey(path, v))
    stateCache.drop(cacheKey(path, v))
    val ok = store.delete(path, manifestName(v))
    store.delete(path, ckptName(v))
    ok
  }

  /** PUBLISHED-STAGE markers (advice r14): `CALL publish` claims
    * `_published_v<N>` through the store CAS before re-applying stage
    * N's delta, so a stage publishes AT MOST ONCE — the second attempt
    * fails the CAS and refuses loudly instead of silently re-adding
    * files a later OPTIMIZE already compacted away. */
  private def publishedMarker(v: Int): String = f"_published_v$v%06d"
  def claimPublished(path: String, v: Int): Boolean =
    store.putIfAbsent(path, publishedMarker(v), "")
  /** Release a claim whose publish REFUSED (OCC conflict) — the stage
    * is still unpublished and may retry after re-planning. */
  def releasePublished(path: String, v: Int): Unit =
    store.delete(path, publishedMarker(v))
  def isPublished(path: String, v: Int): Boolean =
    store.read(path, publishedMarker(v)).isDefined
  // ---- two-table transaction plumbing (r15, verdict item 8) ----

  /** The per-table TRANSACTION LOCK: while present, ordinary commits to
    * this table refuse loudly — a two-table commit is in flight and a
    * concurrent publish would race the decider flip. Content names the
    * token + decider for recovery. */
  private[sources] val TxnLockName = "_txnlock.json"
  private[sources] def claimTxnLock(path: String, content: String): Boolean =
    store.putIfAbsent(path, TxnLockName, content)
  private[sources] def readTxnLock(path: String): Option[String] =
    store.read(path, TxnLockName)
  private[sources] def releaseTxnLock(path: String): Unit =
    store.delete(path, TxnLockName)

  private def requireUnlocked(path: String, ignore: Boolean): Unit =
    if (!ignore && readTxnLock(path).isDefined)
      throw new IllegalStateException(
        s"graft-jsondoc: a two-table transaction is in flight on $path " +
          s"($TxnLockName present) — if its coordinator crashed, " +
          "CALL recover_txn2 to roll it forward or back, then retry")

  /** A staged manifest whose visibility is DECIDED BY ANOTHER TABLE'S
    * ledger (the two-table commit point): `pendingApp`'s entry in
    * `pendingDecider`'s applied-transaction map equal to THIS version
    * means the decider's commit — one CAS — published both tables at
    * one instant. Resolution is one `lastTxn` read on the decider
    * (itself O(1) via the head pointer), paid only by manifests
    * carrying the field, and only until the coordinator's finalize
    * commit supersedes the stage. */
  private def pendingOf(node: JsonNode): Option[(String, String)] =
    for {
      app <- Option(node.get("pendingApp")).map(_.asText())
      dec <- Option(node.get("pendingDecider")).map(_.asText())
    } yield (app, dec)

  /** Vacuum hook: markers whose stage manifest is gone are stale. */
  private[sources] def sweepPublishedMarkers(path: String): Unit =
    store.list(path).foreach { n =>
      if (n.startsWith("_published_v"))
        n.stripPrefix("_published_v").toIntOption.foreach { v =>
          if (store.read(path, manifestName(v)).isEmpty) store.delete(path, n)
        }
    }

  private def readNode(path: String, v: Int): Option[JsonNode] = {
    val k = cacheKey(path, v)
    nodeCache.get(k).orElse {
      val n = store.read(path, manifestName(v)).map(new ObjectMapper().readTree(_))
      n.foreach(nodeCache.put(k, _)) // never cache absence: a racing commit may create it
      n
    }
  }

  private def namesOf(node: JsonNode, field: String): Seq[String] =
    Option(node.get(field)).map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq.empty)
  private def strMapOf(node: JsonNode, field: String): Map[String, String] =
    Option(node.get(field)).map(_.fields().asScala.map(e =>
      e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty)
  private def longMapOf(node: JsonNode, field: String): Map[String, Long] =
    Option(node.get(field)).map(_.fields().asScala.map(e =>
      e.getKey -> e.getValue.asLong()).toMap).getOrElse(Map.empty)
  private def intMapOf(node: JsonNode, field: String): Map[String, Int] =
    Option(node.get(field)).map(_.fields().asScala.map(e =>
      e.getKey -> e.getValue.asInt()).toMap).getOrElse(Map.empty)

  /** Full state from a self-contained node (absolute manifest or ckpt
    * sidecar). Legacy manifests carry no addedAt — every file defaults
    * to this version (conservative for equality deletes: a legacy file
    * is treated as newer, so older eq-deletes skip it; legacy tables
    * have no eq-deletes, so the default is exact in practice). */
  private def absState(node: JsonNode, v: Int): TableState = {
    val live = namesOf(node, "files").toSet
    val added0 = intMapOf(node, "addedAt")
    TableState(live,
      strMapOf(node, "dvs"),
      longMapOf(node, "txns"),
      live.iterator.map(f => f -> added0.getOrElse(f, v)).toMap,
      longMapOf(node, "eqs").toSeq.map { case (n, ev) => (ev.toInt, n) }.sortBy(_._1),
      depth = 0)
  }

  /** Apply one delta node on top of `s`, producing version `v`'s state. */
  private def applyDelta(s: TableState, node: JsonNode, v: Int): TableState = {
    val add = namesOf(node, "add")
    val remove = namesOf(node, "remove").toSet
    val live = (s.live -- remove) ++ add
    val dvs = (s.dvs ++ strMapOf(node, "dvSet")).filter { case (f, _) => live.contains(f) }
    val txns = s.txns ++ longMapOf(node, "txnSet")
    val addedAt = s.addedAt.filter { case (f, _) => live.contains(f) } ++
      add.iterator.map(_ -> v)
    val eqs0 = s.eqs ++ namesOf(node, "eqAdd").map(n => (v, n))
    // equality-delete GC: an eq-delete applies to files ADDED BEFORE it;
    // once every such file is retired the entry is dead weight readers
    // would fold forever. minAddedAt decides membership in O(live).
    val eqs =
      if (eqs0.isEmpty) eqs0
      else {
        val minAdded = if (addedAt.isEmpty) Int.MaxValue else addedAt.values.min
        eqs0.filter { case (ev, _) => ev > minAdded }
      }
    TableState(live, dvs, txns, addedAt, eqs, s.depth + 1)
  }

  private def ckptState(path: String, v: Int): Option[TableState] =
    store.read(path, ckptName(v))
      .map(txt => absState(new ObjectMapper().readTree(txt), v))

  /** Reconstruct (or recall) the snapshot state of version v: walk
    * `base` pointers back to the nearest cached/checkpointed/absolute
    * basis, fold the deltas forward, memoize every intermediate. None
    * iff version v itself has no manifest; a MISSING ANCESTOR of an
    * existing manifest throws — that is a broken chain (hand-deleted
    * metadata), and "no deletes/files" would silently corrupt reads. */
  private[sources] def state(path: String, v: Int): Option[TableState] = {
    // existence of the REQUESTED version is always decided by the store
    // (one stat), never the cache: an externally-expired snapshot must
    // answer None so the streaming expired-basis guards stay loud. A
    // cached ANCESTOR of an existing manifest may serve stale-free (it
    // was immutable while it existed, and our own vacuum checkpoints
    // every kept version before dropping its ancestors).
    if (store.mtime(path, manifestName(v)).isEmpty) return None
    stateCache.get(cacheKey(path, v)).foreach(s => return Some(s))
    var chain = List.empty[(Int, JsonNode)] // deltas to fold, oldest first
    var base = EmptyState
    var cur = v
    var searching = true
    while (searching) {
      if (cur == 0) searching = false
      else stateCache.get(cacheKey(path, cur)) match {
        case Some(s) => base = s; searching = false
        case None => ckptState(path, cur) match {
          case Some(s) =>
            stateCache.put(cacheKey(path, cur), s); base = s; searching = false
          case None =>
            val node = readNode(path, cur).getOrElse(throw new IllegalStateException(
              s"graft-jsondoc: manifest chain of $path v$v is broken — ancestor " +
                s"v$cur is missing (metadata was hand-deleted or corrupted)"))
            if (node.has("files")) {
              base = absState(node, cur)
              stateCache.put(cacheKey(path, cur), base)
              searching = false
            } else {
              chain ::= (cur, node)
              cur = Option(node.get("base")).map(_.asInt()).getOrElse(0)
            }
        }
      }
    }
    var s = base
    chain.foreach { case (ver, node) =>
      s = applyDelta(s, node, ver)
      stateCache.put(cacheKey(path, ver), s)
    }
    Some(s)
  }

  def read(path: String, v: Int): Option[Set[String]] = state(path, v).map(_.live)

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

  // ----------------------------------------------------------- resolution

  private def readHead(path: String): Int =
    store.read(path, HeadName).flatMap { txt =>
      try Option(new ObjectMapper().readTree(txt).get("v")).map(_.asInt())
      catch { case _: Throwable => None }
    }.getOrElse(0)

  /** Best-effort head-pointer refresh: advisory metadata — a lost or
    * stale write costs the next reader a forward probe or a listing,
    * never correctness. Only ever ADVANCED here (a concurrent slower
    * committer must not move the pointer backwards over a newer head);
    * [[refreshHeadAfterDelete]] is the one place it can move back. */
  private def writeHead(path: String, v: Int): Unit =
    try { if (readHead(path) < v) store.put(path, HeadName, s"""{"v":$v}""") }
    catch { case _: Throwable => () }

  /** After discarding the newest manifest the pointer must move BACK or
    * every resolution falls to the listing forever. Maintenance path,
    * listing cost is fine. */
  private[sources] def refreshHeadAfterDelete(path: String): Unit =
    try store.put(path, HeadName,
      s"""{"v":${manifests(path).lastOption.getOrElse(0)}}""")
    catch { case _: Throwable => () }

  /** Newest committed manifest version, 0 when none — resolved via the
    * head pointer + forward probe (O(1 + pointer lag) existence checks),
    * falling back to the directory listing when the pointer is missing
    * or names a deleted manifest. */
  def latestManifestVersion(path: String): Int = {
    val h = readHead(path)
    if (h > 0 && store.mtime(path, manifestName(h)).isDefined) {
      var w = h
      while (store.mtime(path, manifestName(w + 1)).isDefined) w += 1
      w
    } else manifests(path).lastOption.getOrElse(0)
  }

  /** Greatest PUBLISHED (non-staged) version — the basis of every
    * current read, current-write rebase, and ledger lookup. Walks DOWN
    * from the newest manifest over staged heads (and the number gaps
    * discarded stages leave); the common case (head unstaged) is one
    * cached node read. */
  def latestVersion(path: String): Option[Int] =
    latestVersion0(path, resolvePending = true)

  private def latestVersion0(path: String, resolvePending: Boolean): Option[Int] = {
    var v = latestManifestVersion(path)
    while (v > 0) {
      val node = readNode(path, v)
      node match {
        case Some(n)
          if !Option(n.get("staged")).exists(_.asBoolean()) => return Some(v)
        case Some(n) if resolvePending =>
          // a pendingTxn stage counts as PUBLISHED iff its decider's
          // ledger carries (app -> this version) — the two-table commit
          // point (r15). The decider read deliberately does NOT resolve
          // the decider's own pending stages (one level only, no cycle).
          pendingOf(n).foreach { case (app, decider) =>
            val decided = latestVersion0(decider, resolvePending = false)
              .flatMap(dv => readTxns(decider, dv).get(app)).contains(v.toLong)
            if (decided) return Some(v)
          }
        case _ => ()
      }
      v -= 1
    }
    None
  }

  /** The DELETE-VECTOR map of version v: `live data file -> DV file
    * name` (r14, merge-on-read). A DV names the row POSITIONS of its
    * data file that are deleted as of this version; readers fold it at
    * scan. DV files are immutable like data files — a further MOR
    * delete writes a NEW DV holding the union and repoints the map — so
    * time travel reads each version's own deletion state. Files without
    * an entry have no deletes. */
  def readDvs(path: String, v: Int): Map[String, String] =
    if (v == 0) Map.empty else state(path, v).map(_.dvs).getOrElse(Map.empty)

  /** DV map to read under: pinned version's, else the latest
    * PUBLISHED version's (a staged head's DVs are invisible until
    * publish, like its files). */
  def dvsFor(path: String, pinned: Option[Int]): Map[String, String] =
    pinned.orElse(latestVersion(path)) match {
      case Some(v) => readDvs(path, v)
      case None => Map.empty
    }

  /** The EQUALITY-DELETE list of version v as (written-at version,
    * file name), plus the addedAt map eq applicability is decided
    * against (r15 — streaming upsert). Empty for tables without eqs. */
  def eqsFor(path: String, pinned: Option[Int]): (Seq[(Int, String)], Map[String, Int]) =
    pinned.orElse(latestVersion(path)).flatMap(state(path, _)) match {
      case Some(s) => (s.eqs, s.addedAt)
      case None => (Seq.empty, Map.empty)
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
    * version` (the Delta `txnAppId`/`txnVersion` idiom). Folded into
    * the same artifact that makes a write visible — no external ledger,
    * no crash window between data commit and ledger write. */
  def readTxns(path: String, v: Int): Map[String, Long] =
    if (v == 0) Map.empty else state(path, v).map(_.txns).getOrElse(Map.empty)

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

  // -------------------------------------------------------------- commits

  /** Serialize a full state as checkpoint/absolute-manifest JSON body
    * fields onto `root`. */
  private def writeStateFields(root: com.fasterxml.jackson.databind.node.ObjectNode,
      s: TableState): Unit = {
    val arr = root.putArray("files")
    s.live.toSeq.sorted.foreach(arr.add)
    if (s.txns.nonEmpty) {
      val t = root.putObject("txns")
      s.txns.toSeq.sortBy(_._1).foreach { case (app, ver) => t.put(app, ver) }
    }
    if (s.dvs.nonEmpty) {
      val d = root.putObject("dvs")
      s.dvs.toSeq.sortBy(_._1).foreach { case (f, dv) => d.put(f, dv) }
    }
    // addedAt written sparsely: only entries differing from the default
    // (the version being written) survive the round trip exactly
    val nonDefault = s.addedAt.filter { case (f, _) => s.live.contains(f) }
    if (nonDefault.nonEmpty) {
      val a = root.putObject("addedAt")
      nonDefault.toSeq.sortBy(_._1).foreach { case (f, v) => a.put(f, v) }
    }
    if (s.eqs.nonEmpty) {
      val e = root.putObject("eqs")
      s.eqs.sortBy(_._2).foreach { case (ev, n) => e.put(n, ev.toLong) }
    }
  }

  private def absoluteManifestJson(v: Int, s: TableState, op: String): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", v)
    if (op.nonEmpty) root.put("op", op)
    writeStateFields(root, s)
    mapper.writeValueAsString(root)
  }

  private def deltaManifestJson(v: Int, base: Int, add: Set[String],
      remove: Set[String], dvSet: Map[String, String], txnSet: Map[String, Long],
      eqAdd: Seq[String], rewrites: Map[String, Rewrite], op: String,
      stagedParent: Option[Int], pendingTxn: Option[(String, String)] = None): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", v)
    root.put("base", base)
    if (op.nonEmpty) root.put("op", op)
    stagedParent.foreach { p =>
      root.put("staged", true)
      root.put("parent", p)
    }
    pendingTxn.foreach { case (app, decider) =>
      root.put("pendingApp", app)
      root.put("pendingDecider", decider)
    }
    if (add.nonEmpty) { val a = root.putArray("add"); add.toSeq.sorted.foreach(a.add) }
    if (remove.nonEmpty) { val r = root.putArray("remove"); remove.toSeq.sorted.foreach(r.add) }
    if (dvSet.nonEmpty) {
      val d = root.putObject("dvSet")
      dvSet.toSeq.sortBy(_._1).foreach { case (f, dv) => d.put(f, dv) }
    }
    if (txnSet.nonEmpty) {
      val t = root.putObject("txnSet")
      txnSet.toSeq.sortBy(_._1).foreach { case (app, ver) => t.put(app, ver) }
    }
    if (eqAdd.nonEmpty) { val e = root.putArray("eqAdd"); eqAdd.sorted.foreach(e.add) }
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

  /** Write the checkpoint sidecar for a just-committed version (best
    * effort, idempotent — the CAS makes a concurrent duplicate write a
    * no-op; a failure merely lengthens the next walk). */
  private def writeCkpt(path: String, v: Int, s: TableState): Unit =
    try {
      val mapper = new ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("version", v)
      writeStateFields(root, s)
      store.putIfAbsent(path, ckptName(v), mapper.writeValueAsString(root))
      ()
    } catch { case _: Throwable => () }

  /** Force a checkpoint for version v if none exists — vacuum calls
    * this for every KEPT version before dropping older manifests, so a
    * kept delta's reconstruction never needs a dropped ancestor. */
  private[sources] def ensureCheckpoint(path: String, v: Int): Unit =
    if (store.read(path, ckptName(v)).isEmpty)
      state(path, v).foreach(s => writeCkpt(path, v, s.copy(depth = 0)))

  /** DV carry-forward rule, shared by both commit paths: prior entries
    * survive only while their data file stays live (a retired/truncated
    * file's deletions died with it), then this commit's updates apply —
    * also live-filtered, so an update raced away by a rewrite can never
    * resurrect a dropped file's entry. */
  private def carryDvs(prevDvs: Map[String, String],
      updates: Map[String, String], newLive: Set[String]): Map[String, String] =
    (prevDvs ++ updates).filter { case (f, _) => newLive.contains(f) }

  /** Write version latest+1 naming `newLive` ABSOLUTELY (a
    * self-contained manifest — bootstrap, rollback: rare, maintenance-
    * grade, O(live files) bytes by design); atomic CAS claim through
    * the store. Returns the committed version. A concurrent commit
    * between the latest-read and the claim throws
    * ConcurrentModificationException — an absolute set computed against
    * a stale base cannot be rebased here (the caller does not say what
    * it added or removed); retryable callers use [[commitDelta]].
    *
    * `dvsOverride`/`addedAtOverride`/`eqsOverride` (rollback): restore
    * the TARGET version's deletion/sequencing state verbatim
    * (live-filtered) instead of carrying the latest forward. */
  def commit(path: String, newLive: Set[String],
      txn: Option[(String, Long)] = None,
      dvsOverride: Option[Map[String, String]] = None,
      addedAtOverride: Option[Map[String, Int]] = None,
      eqsOverride: Option[Seq[(Int, String)]] = None,
      op: String = "",
      ignoreTxnLock: Boolean = false): Int = {
    requireUnlocked(path, ignoreTxnLock)
    // version numbering covers the WHOLE chain (CAS on names); txn/DV
    // carry-forward reads the latest PUBLISHED basis (staged WAP heads
    // contribute nothing to published state)
    val v = latestManifestVersion(path) + 1
    val prev = latestVersion(path).flatMap(state(path, _))
    val txns = prev.map(_.txns).getOrElse(Map.empty) ++ txn
    val dvs = dvsOverride match {
      case Some(o) => o.filter { case (f, _) => newLive.contains(f) }
      case None => carryDvs(prev.map(_.dvs).getOrElse(Map.empty), Map.empty, newLive)
    }
    val addedAt = addedAtOverride match {
      case Some(o) => newLive.iterator.map(f => f -> o.getOrElse(f, v)).toMap
      case None =>
        val prevAdded = prev.map(_.addedAt).getOrElse(Map.empty)
        newLive.iterator.map(f => f -> prevAdded.getOrElse(f, v)).toMap
    }
    val eqs = eqsOverride.getOrElse(Seq.empty)
    val s = TableState(newLive, dvs, txns, addedAt, eqs, depth = 0)
    if (!store.putIfAbsent(path, manifestName(v), absoluteManifestJson(v, s, op)))
      throw new java.util.ConcurrentModificationException(
        s"graft-jsondoc: manifest v$v of $path was committed concurrently — " +
          "this absolute commit cannot rebase; re-read the table and retry")
    stateCache.put(cacheKey(path, v), s)
    writeHead(path, v)
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
    * version is minted (idempotent streaming replays).
    *
    * The MANIFEST WRITTEN IS THE DELTA ITSELF (r15): O(changed files)
    * bytes regardless of table size; every [[CkptEvery]] commits the
    * committer also drops a full-state checkpoint sidecar bounding the
    * reconstruction walk.
    *
    * `dvBasis`: the delete-vector map a REWRITE read its inputs under
    * (r14) — drift on a `removed`/repointed file aborts (resurrection
    * guard). `extraTxns` (advice r14): ledger entries merged max-wins
    * (publish carries a staged chain's epochs). `eqAdd` (r15): equality-
    * delete files this commit introduces, sequenced at this version. */
  def commitDelta(path: String, removed: Set[String], added: Set[String],
      txn: Option[(String, Long)] = None,
      dvUpdates: Map[String, String] = Map.empty,
      dvBasis: Option[Map[String, String]] = None,
      rewrites: Map[String, Rewrite] = Map.empty,
      op: String = "",
      staged: Boolean = false,
      stagedBase: Option[Int] = None,
      extraTxns: Map[String, Long] = Map.empty,
      eqAdd: Seq[String] = Seq.empty,
      eqBasis: Option[Seq[(Int, String)]] = None,
      pendingTxn: Option[(String, String)] = None,
      ignoreTxnLock: Boolean = false): Int = {
    requireUnlocked(path, ignoreTxnLock)
    var attempt = 0
    while (true) {
      // numbering over the whole chain; the REBASE BASE is the latest
      // PUBLISHED version — a current write must never absorb a staged
      // head's files into the visible live set (WAP invisibility), and
      // a STAGED write bases on published state too (each staged
      // snapshot is an independent candidate off the current table) —
      // UNLESS it extends a BRANCH (r14): `stagedBase` = the branch's
      // staged head, so successive branch writes build on each other
      val v = latestManifestVersion(path) + 1
      val prev = stagedBase.filter(_ > 0).orElse(latestVersion(path))
      // an unreadable LATEST manifest must abort, not silently rebase
      // onto an empty set — that would commit a live set holding only
      // this delta's additions and drop the whole table
      val baseState = prev match {
        case Some(pv) => state(path, pv).getOrElse(
          throw new java.io.IOException(
            s"graft-jsondoc: latest manifest v$pv of $path is unreadable — refusing to commit over it"))
        case None => EmptyState
      }
      val base = baseState.live
      val missing = removed -- base
      if (missing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"graft-jsondoc: commit to $path retires files no longer live " +
            s"(${missing.take(3).mkString(", ")}) — a concurrent rewrite won; re-plan")
      // a DV targeting a no-longer-live file is the same conflict: the
      // positions were derived from contents a concurrent rewrite has
      // since replaced — applying them to nothing silently un-deletes.
      // A file THIS commit adds is exempt (r17): a merged/published
      // branch chain legitimately lands a file and its own delete
      // vector in one atomic step (branch DML on a branch-added file)
      val dvMissing = dvUpdates.keySet -- base -- added
      if (dvMissing.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"graft-jsondoc: commit to $path carries delete vectors for files no longer " +
            s"live (${dvMissing.take(3).mkString(", ")}) — a concurrent rewrite won; re-plan")
      val newLive = (base -- removed) ++ added
      val txns0 = baseState.txns
      val txnsMerged = extraTxns.foldLeft(txns0) { case (m, (a, e)) =>
        m.updated(a, m.get(a).fold(e)(math.max(_, e)))
      } ++ txn
      val prevDvs = baseState.dvs
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
      // a rewrite whose outputs baked in the equality deletes it folded
      // at scan must refuse when the eq list moved since (r15): a
      // concurrent upsert epoch's deletions against the retired inputs
      // would be silently resurrected in the outputs
      eqBasis.foreach { basis =>
        if (removed.nonEmpty && baseState.eqs != basis)
          throw new java.util.ConcurrentModificationException(
            s"graft-jsondoc: commit to $path retires files read under an equality-" +
              "delete list that has changed since (a concurrent upsert epoch " +
              "landed) — committing would resurrect its deletes; re-plan")
      }
      val dvs = carryDvs(prevDvs, dvUpdates, newLive)
      if (!staged && newLive == base && dvs == prevDvs && txnsMerged == txns0 &&
        eqAdd.isEmpty &&
        txn.forall { case (a, e) => txns0.get(a).contains(e) })
        return prev.getOrElse(0)
      val txnSet = txnsMerged.filter { case (a, e) => !txns0.get(a).contains(e) }
      val dvSet = dvUpdates.filter { case (f, _) => newLive.contains(f) }
      if (store.putIfAbsent(path, manifestName(v),
        deltaManifestJson(v, prev.getOrElse(0), added, removed & base, dvSet,
          txnSet, eqAdd, rewrites, op,
          stagedParent = if (staged) Some(prev.getOrElse(0)) else None,
          pendingTxn = pendingTxn))) {
        // memoize the new state (cheap: built from the already-resolved
        // base) and keep the resolution metadata fresh
        val addedAt = baseState.addedAt
          .filter { case (f, _) => newLive.contains(f) } ++ added.iterator.map(_ -> v)
        val eqs0 = baseState.eqs ++ eqAdd.map(n => (v, n))
        val eqs =
          if (eqs0.isEmpty) eqs0
          else {
            val minAdded = if (addedAt.isEmpty) Int.MaxValue else addedAt.values.min
            eqs0.filter { case (ev, _) => ev > minAdded }
          }
        val newState = TableState(newLive, dvs, txnsMerged, addedAt, eqs,
          baseState.depth + 1)
        writeHead(path, v)
        if (newState.depth >= CkptEvery) {
          writeCkpt(path, v, newState.copy(depth = 0))
          stateCache.put(cacheKey(path, v), newState.copy(depth = 0))
        } else stateCache.put(cacheKey(path, v), newState)
        return v
      }
      attempt += 1
      if (attempt > 100)
        throw new java.io.IOException(
          s"graft-jsondoc: gave up committing to $path after $attempt collisions")
    }
    -1 // unreachable
  }

  /** ADOPT a version's state wholesale as a new PUBLISHED commit (r15,
    * branch fast-forward): a delta manifest with base = `of` and an
    * EMPTY delta — O(1) metadata, no delta computation, no
    * re-application. Sound ONLY when the caller has proven no published
    * work landed since `of`'s chain forked (fast_forward checks the
    * fork == current head); the CAS failing here means something
    * committed concurrently, and the caller's precondition is void —
    * loud abort, no retry. */
  def commitAdopt(path: String, of: Int, op: String): Int = {
    val s = state(path, of).getOrElse(throw new IllegalArgumentException(
      s"graft-jsondoc: cannot adopt v$of of $path — no such committed version"))
    val v = latestManifestVersion(path) + 1
    if (!store.putIfAbsent(path, manifestName(v),
      deltaManifestJson(v, of, Set.empty, Set.empty, Map.empty, Map.empty,
        Seq.empty, Map.empty, op, stagedParent = None)))
      throw new java.util.ConcurrentModificationException(
        s"graft-jsondoc: manifest v$v of $path was committed concurrently — " +
          "the fast-forward precondition no longer holds; re-check and retry")
    val newState = s.copy(depth = s.depth + 1)
    writeHead(path, v)
    if (newState.depth >= CkptEvery) {
      writeCkpt(path, v, newState.copy(depth = 0))
      stateCache.put(cacheKey(path, v), newState.copy(depth = 0))
    } else stateCache.put(cacheKey(path, v), newState)
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
  * the manifest claim — the ONE atomic point. Begin before the
  * command, clear in a finally (the commit itself consumes the entry on
  * success, so the finally only matters on failure). Keys are
  * canonical paths; one pending transaction per table at a time
  * (`begin` refuses a second, spec-pinned).
  *
  * MULTI-WRITER CONTRACT (r14, tightened r15): this registry is
  * PER-JVM. Across processes, the manifest CAS still fully protects the
  * LIVE SET (racing commits rebase or abort; no file is ever lost), and
  * a crash-and-retry of ONE applier is exactly-once (check `lastTxn`,
  * apply, commit folds the epoch atomically — replay sees the epoch and
  * skips). What the plain check canNOT protect is TWO CONCURRENT
  * appliers of the same (table, appId): both read `lastTxn` before
  * either commits, both apply, and the fold lands twice — the
  * check-then-apply window. [[claimEpoch]] (r15) closes it with a
  * begin-token CAS on the [[CommitStore]] seam: the claim happens AT
  * check time, so the second applier refuses before applying. Opt-in —
  * the engine's own appliers (the q183/q188 MV folds) are checkpointed
  * streams, which Spark already constrains to one active run per
  * checkpoint, and a claim is one extra store round-trip per epoch.
  * Liveness trade, stated plainly: a claimer that DIES mid-apply leaves
  * its token, and the next applier of that epoch refuses LOUDLY (naming
  * [[clearEpochClaim]]) instead of silently double-applying — without
  * leases, loud-block is the safe side of that coin. A claim for an
  * OLDER epoch is provably dead (the lineage moved past it) and is
  * swept automatically. */
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

  private def claimName(appId: String): String =
    // appIds are caller-chosen: sanitize into the store's flat namespace
    "_txnclaim_" + appId.map(c => if (c.isLetterOrDigit || c == '-' || c == '.') c else '_')

  /** CLAIM epoch `e` of `appId` on `path` (r15 — the begin-token CAS):
    * true = this caller owns the apply; false = the epoch is already
    * folded into published state. Throws when another applier holds a
    * live claim for this same epoch — concurrent appliers of one
    * (table, appId) are a deployment error, and loud-block beats the
    * silent double-fold the bare `lastTxn` check allows. The claim is
    * consumed by [[JsonDocVersions.commitDelta]]'s caller via
    * [[releaseEpochClaim]] after the commit (a same-epoch replay is
    * already screened by the ledger before the claim is ever read). */
  def claimEpoch(path: String, appId: String, epoch: Long): Boolean = {
    if (JsonDocVersions.lastTxn(path, appId).exists(_ >= epoch)) return false
    val name = claimName(appId)
    val content = s"""{"epoch":$epoch}"""
    var attempts = 0
    while (!JsonDocVersions.store.putIfAbsent(path, name, content)) {
      val held = JsonDocVersions.store.read(path, name)
        .flatMap(t => "\\d+".r.findFirstIn(t)).map(_.toLong)
      held match {
        case Some(h) if h < epoch =>
          // a claim for an OLDER epoch is provably dead: either its
          // commit landed (the ledger screened us past it) or its
          // applier died and the lineage has moved on — sweep and retry
          JsonDocVersions.store.delete(path, name)
        case Some(h) if h > epoch =>
          return false // we are the stale lineage member
        case _ =>
          // same epoch: re-screen the ledger once (the holder may have
          // just committed), else refuse loudly
          if (JsonDocVersions.lastTxn(path, appId).exists(_ >= epoch)) return false
          throw new IllegalStateException(
            s"graft-jsondoc: epoch $epoch of '$appId' on $path is claimed by a " +
              "concurrent applier (or one that died mid-apply) — one applier per " +
              "(table, appId); if the holder is dead, GraftTxn.clearEpochClaim " +
              "releases the token")
      }
      attempts += 1
      if (attempts > 10)
        throw new java.io.IOException(
          s"graft-jsondoc: gave up claiming epoch $epoch of '$appId' on $path")
    }
    true
  }

  /** Release after the epoch's commit (or to recover a dead claimer). */
  def releaseEpochClaim(path: String, appId: String): Unit =
    JsonDocVersions.store.delete(path, claimName(appId))

  /** Operator-facing recovery alias. */
  def clearEpochClaim(path: String, appId: String): Unit =
    releaseEpochClaim(path, appId)
}
