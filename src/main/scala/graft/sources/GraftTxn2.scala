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

  private def lockJson(tok: String, decider: String, staged: Int,
      app: String): String = {
    val m = new ObjectMapper()
    val root = m.createObjectNode()
    root.put("token", tok)
    root.put("decider", decider)
    root.put("app", app)
    if (staged > 0) root.put("staged", staged)
    m.writeValueAsString(root)
  }

  private def parseLock(txt: String): (String, String, Int, String) = {
    val n = new ObjectMapper().readTree(txt)
    val tok = n.get("token").asText()
    (tok, n.get("decider").asText(),
      Option(n.get("staged")).map(_.asInt()).getOrElse(0),
      Option(n.get("app")).map(_.asText()).getOrElse(s"txn2:$tok"))
  }

  /** Per-participant ledger key: one decider commit carries every
    * participant's entry, so each needs its own app id. */
  private def appOf(tok: String, i: Int): String = s"txn2:$tok:$i"

  /** Commit `a` and `b` atomically — the N = 2 special case. Returns
    * (A's published version, B's published version). */
  def commitTwo(a: Delta, b: Delta,
      failpoint: Int => Unit = _ => ()): (Int, Int) = {
    val (pubs, vd) = commitN(Seq(a), b, failpoint)
    (pubs.head, vd)
  }

  /** N-TABLE ATOMIC COMMIT (r16, the r15 verdict's item 8 — an MV graph
    * fanning one base into several views): ONE decider table, N−1
    * staged participants. The protocol is commitTwo's with the stage
    * leg fanned out:
    *
    *  1. lock EVERY participant (CAS; a failed claim releases the locks
    *     already taken and aborts loudly — non-blocking, so no deadlock
    *     ordering is needed);
    *  2. stage each participant's delta, its visibility delegated to
    *     the decider's ledger under its OWN app id `txn2:<tok>:<i>`;
    *  3. THE COMMIT POINT: the decider's ordinary CAS carries ALL N−1
    *     ledger entries in one manifest (`extraTxns`) — every
    *     participant's resolution rule flips in the same linearization
    *     step, before it none is visible;
    *  4. finalize each participant (O(1) adopt); 5. unlock each.
    *
    * Crash anywhere: "all or nothing" — before step 3 nothing is
    * visible and [[recover]] (per participant, idempotent) rolls back;
    * from step 3 on, everything is visible and recover rolls forward.
    * `failpoint` is the TEST seam: called with the step number just
    * completed (1 lock, 2 stage, 3 decide, 4 finalize). */
  def commitN(staged: Seq[Delta], decider: Delta,
      failpoint: Int => Unit = _ => ()): (Seq[Int], Int) = {
    require(staged.nonEmpty, "graft-txn2: need at least one staged participant")
    require((staged.map(_.path) :+ decider.path).distinct.size == staged.size + 1,
      "graft-txn2: all participant tables must differ " +
        "(a single table's commit is already atomic)")
    val tok = token()
    // 1. lock every participant; back out the locks taken on a refusal
    var locked = List.empty[String]
    staged.zipWithIndex.foreach { case (d, i) =>
      if (!JsonDocVersions.claimTxnLock(d.path,
        lockJson(tok, decider.path, 0, appOf(tok, i)))) {
        locked.foreach(JsonDocVersions.releaseTxnLock)
        throw new IllegalStateException(
          s"graft-txn2: a transaction is already in flight on ${d.path} — " +
            "CALL recover_txn2 if its coordinator crashed")
      }
      locked ::= d.path
    }
    failpoint(1)
    val (vas, vd) =
      try {
        // 2. stage each participant, visibility delegated to the decider
        val vas = staged.zipWithIndex.map { case (d, i) =>
          val va = JsonDocVersions.commitDelta(d.path, d.removed, d.added,
            staged = true, op = "txn2-stage",
            pendingTxn = Some((appOf(tok, i), decider.path)), ignoreTxnLock = true)
          // re-write the lock with the staged version so recovery after
          // a crash knows which stage this txn owns (CAS-free overwrite
          // is fine: the lock holder is the only writer of its content)
          JsonDocVersions.store.put(d.path, JsonDocVersions.TxnLockName,
            lockJson(tok, decider.path, va, appOf(tok, i)))
          va
        }
        failpoint(2)
        // 3. THE COMMIT POINT: the decider's ordinary CAS carries every
        // (app -> va). The decider must be unlocked (its own lock
        // refusal breaks participant<->decider cycles).
        val vd = JsonDocVersions.commitDelta(decider.path, decider.removed,
          decider.added,
          extraTxns = vas.zipWithIndex.map { case (va, i) =>
            appOf(tok, i) -> va.toLong }.toMap,
          op = "txn2-commit")
        failpoint(3)
        (vas, vd)
      } catch {
        case e: HardCrash => throw e // simulated process death: no cleanup runs
        case e: Throwable =>
          // roll BACK only while the decider has not committed; after
          // step 3 the transaction is durable and must roll FORWARD —
          // leave the locks for recover() rather than half-undoing
          val committed =
            JsonDocVersions.lastTxn(decider.path, appOf(tok, 0)).isDefined
          if (!committed) {
            staged.zipWithIndex.foreach { case (d, i) =>
              JsonDocVersions.manifests(d.path)
                .filter(v => JsonDocVersions.readStaged(d.path, v))
                .foreach { v =>
                  if (pendingTokenOf(d.path, v).contains(appOf(tok, i))) {
                    JsonDocVersions.deleteManifest(d.path, v)
                    JsonDocVersions.refreshHeadAfterDelete(d.path)
                  }
                }
              JsonDocVersions.releaseTxnLock(d.path)
            }
          }
          throw e
      }
    // 4. finalize: adopt each stage as plain published state (O(1))
    val pubs = staged.zip(vas).map { case (d, va) =>
      JsonDocVersions.commitAdopt(d.path, va, op = "txn2-finalize") }
    failpoint(4)
    // 5. unlock
    staged.foreach(d => JsonDocVersions.releaseTxnLock(d.path))
    (pubs, vd)
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
        val (_, decider, staged, app) = parseLock(txt)
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
