package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper

/** TWO-TABLE ATOMIC COMMIT (r15, the r14 verdict's item 8): make one
  * logical change — e.g. an MV fold that must move the base table's
  * consumed marker AND the view's content together — visible on TWO
  * graft tables at ONE instant, with no observable state where one
  * committed and the other didn't.
  *
  * The protocol turns the second table's ordinary manifest CAS into the
  * joint commit point (the "second publish embeds the first's version"
  * shape):
  *
  *  1. **Lock A** — CAS `_txnlock.json` onto table A naming the token
  *     and decider. While held, ordinary commits to A refuse loudly
  *     (they would race the decider flip below). B stays unlocked.
  *  2. **Stage A** — commit A's delta as a STAGED manifest `va`
  *     carrying `pendingApp`/`pendingDecider`: invisible now, but its
  *     visibility is delegated to B's ledger.
  *  3. **Commit B** — ONE ordinary published commit of B's delta whose
  *     applied-transaction map gains `(token -> va)`. *This CAS is the
  *     transaction.* The instant it lands, B's delta is published AND
  *     A's resolution rule ([[JsonDocVersions.latestVersion]]) counts
  *     `va` as published — both tables flip in the same linearization
  *     step. Before it, neither is visible.
  *  4. **Finalize A** — adopt `va` as a plain published commit (O(1)
  *     metadata), so future A-reads stop paying the decider lookup.
  *  5. **Unlock A.**
  *
  * Crash anywhere: the observable state is always "both or neither" —
  * steps 1-2 leave both tables unchanged to readers; steps 3-5 leave
  * both changed. [[recover]] rolls a crashed coordinator forward (B's
  * ledger carries the token) or back (it doesn't), then unlocks; it is
  * idempotent and safe to call on any locked table.
  *
  * Contract notes: deltas are FILE-LEVEL (the caller lands its data
  * files through the ordinary two-phase temp/rename protocol first,
  * exactly like every other committer); the decider must not itself be
  * the A-side of another in-flight transaction (B's commit refuses on
  * B's own lock, which breaks the cross-table cycle); one coordinator
  * per A-table at a time (the lock CAS enforces it). */
private[graft] object GraftTxn2 {

  final case class Delta(path: String, removed: Set[String], added: Set[String])

  /** Test seam: a failpoint throwing this simulates PROCESS DEATH — the
    * coordinator's inline rollback does NOT run (a dead process runs
    * nothing), leaving exactly the on-disk state [[recover]] exists
    * for. Any other exception models an ordinary failure, which the
    * coordinator cleans up inline while it still can. */
  final class HardCrash(step: Int) extends RuntimeException(s"hard crash after step $step")

  private def token(): String = java.util.UUID.randomUUID().toString.take(16)

  private def lockJson(tok: String, decider: String, staged: Int): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("token", tok)
    root.put("decider", decider)
    if (staged > 0) root.put("staged", staged)
    m.writeValueAsString(root)
  }

  private def parseLock(txt: String): (String, String, Int) = {
    val n = new ObjectMapper().readTree(txt)
    (n.get("token").asText(), n.get("decider").asText(),
      Option(n.get("staged")).map(_.asInt()).getOrElse(0))
  }

  private def appOf(tok: String): String = s"txn2:$tok"

  /** Commit `a` and `b` atomically. `failpoint` is a TEST seam: called
    * with the step number just completed (1 lock, 2 stage, 3 decide,
    * 4 finalize); a throw simulates a coordinator crash at that point.
    * Returns (A's published version, B's published version). */
  def commitTwo(a: Delta, b: Delta,
      failpoint: Int => Unit = _ => ()): (Int, Int) = {
    require(a.path != b.path, "graft-txn2: the two tables must differ " +
      "(a single table's commit is already atomic)")
    val tok = token()
    // 1. lock A
    if (!JsonDocVersions.claimTxnLock(a.path, lockJson(tok, b.path, 0)))
      throw new IllegalStateException(
        s"graft-txn2: a transaction is already in flight on ${a.path} — " +
          "CALL recover_txn2 if its coordinator crashed")
    failpoint(1)
    val (va, vb) =
      try {
        // 2. stage A's delta, visibility delegated to B's ledger
        val va = JsonDocVersions.commitDelta(a.path, a.removed, a.added,
          staged = true, op = "txn2-stage",
          pendingTxn = Some((appOf(tok), b.path)), ignoreTxnLock = true)
        // re-write the lock with the staged version so recovery after a
        // crash knows which stage this txn owns (CAS-free overwrite is
        // fine: the lock holder is the only writer of its content)
        JsonDocVersions.store.put(a.path, JsonDocVersions.TxnLockName,
          lockJson(tok, b.path, va))
        failpoint(2)
        // 3. THE COMMIT POINT: B's ordinary CAS carries (token -> va).
        // B must be unlocked (its own lock refusal breaks A<->B cycles).
        val vb = JsonDocVersions.commitDelta(b.path, b.removed, b.added,
          txn = Some((appOf(tok), va.toLong)), op = "txn2-commit")
        failpoint(3)
        (va, vb)
      } catch {
        case e: HardCrash => throw e // simulated process death: no cleanup runs
        case e: Throwable =>
          // roll BACK only while the decider has not committed; after
          // step 3 the transaction is durable and must roll FORWARD —
          // leave the lock for recover() rather than half-undoing
          val committed = JsonDocVersions.lastTxn(b.path, appOf(tok)).isDefined
          if (!committed) {
            // discard the stage (if any) and unlock: clean abort
            JsonDocVersions.manifests(a.path)
              .filter(v => JsonDocVersions.readStaged(a.path, v))
              .foreach { v =>
                if (pendingTokenOf(a.path, v).contains(appOf(tok))) {
                  JsonDocVersions.deleteManifest(a.path, v)
                  JsonDocVersions.refreshHeadAfterDelete(a.path)
                }
              }
            JsonDocVersions.releaseTxnLock(a.path)
          }
          throw e
      }
    // 4. finalize: adopt va as plain published state (O(1))
    val vaPub = JsonDocVersions.commitAdopt(a.path, va, op = "txn2-finalize")
    failpoint(4)
    // 5. unlock
    JsonDocVersions.releaseTxnLock(a.path)
    (vaPub, vb)
  }

  private def pendingTokenOf(path: String, v: Int): Option[String] = {
    val txt = JsonDocVersions.store.read(path, JsonDocVersions.manifestName(v))
    txt.flatMap { t =>
      val n = new ObjectMapper().readTree(t)
      Option(n.get("pendingApp")).map(_.asText())
    }
  }

  /** Recover a crashed coordinator on `pathA`: if the decider's ledger
    * carries the token, the transaction COMMITTED — roll forward
    * (finalize + unlock); otherwise it didn't — roll back (discard the
    * stage + unlock). Idempotent; returns "forward", "back", or
    * "clean" (no lock present). */
  def recover(pathA: String): String =
    JsonDocVersions.readTxnLock(pathA) match {
      case None => "clean"
      case Some(txt) =>
        val (tok, decider, staged) = parseLock(txt)
        val app = appOf(tok)
        val decided = JsonDocVersions.lastTxn(decider, app)
        decided match {
          case Some(va) =>
            // committed: finalize if the stage is still the unadopted
            // head (an earlier recover/finalize may have done it)
            if (JsonDocVersions.latestManifestVersion(pathA) == va.toInt &&
              JsonDocVersions.readStaged(pathA, va.toInt))
              JsonDocVersions.commitAdopt(pathA, va.toInt, op = "txn2-finalize")
            JsonDocVersions.releaseTxnLock(pathA)
            "forward"
          case None =>
            if (staged > 0 && pendingTokenOf(pathA, staged).contains(app)) {
              JsonDocVersions.deleteManifest(pathA, staged)
              JsonDocVersions.refreshHeadAfterDelete(pathA)
            }
            JsonDocVersions.releaseTxnLock(pathA)
            "back"
        }
    }
}
