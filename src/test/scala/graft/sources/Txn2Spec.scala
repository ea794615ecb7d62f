package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** TWO-TABLE ATOMIC COMMIT (r15, verdict item 8): crash-injection
  * proof that NO observable state has one table committed and the
  * other not. The coordinator's failpoint seam simulates a crash after
  * each protocol step; after every crash we assert the joint
  * either-both-or-neither invariant through the PUBLIC read surface
  * (latest live sets), then prove recover() converges to a consistent
  * end state. No Spark session needed — the protocol is pure manifest
  * arithmetic, which is the point. */
class Txn2Spec extends AnyFunSuite {

  private case class Fixture(a: String, b: String)

  private def fixture(): Fixture = {
    val a = java.nio.file.Files.createTempDirectory("graft_txn2_a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_txn2_b").toString
    JsonDocVersions.commitDelta(a, Set.empty, Set("a-base.jsonl")) // A v1
    JsonDocVersions.commitDelta(b, Set.empty, Set("b-base.jsonl")) // B v1
    Fixture(a, b)
  }

  private def liveA(f: Fixture): Set[String] = JsonDocVersions.latest(f.a).get._2
  private def liveB(f: Fixture): Set[String] = JsonDocVersions.latest(f.b).get._2

  private def deltas(f: Fixture) = (
    GraftTxn2.Delta(f.a, Set.empty, Set("a-epoch1.jsonl")),
    GraftTxn2.Delta(f.b, Set.empty, Set("b-epoch1.jsonl")))

  /** The invariant: A shows its new file IFF B shows its new file. */
  private def assertJoint(f: Fixture, committed: Option[Boolean] = None): Unit = {
    val aIn = liveA(f).contains("a-epoch1.jsonl")
    val bIn = liveB(f).contains("b-epoch1.jsonl")
    assert(aIn === bIn,
      s"ATOMICITY BROKEN: A committed=$aIn but B committed=$bIn")
    committed.foreach(c => assert(aIn === c,
      s"expected committed=$c, observed A=$aIn B=$bIn"))
  }

  test("happy path: both flip together; finalize makes A's head a plain published commit") {
    val f = fixture()
    val (d1, d2) = deltas(f)
    assertJoint(f, Some(false))
    val (va, vb) = GraftTxn2.commitTwo(d1, d2)
    assertJoint(f, Some(true))
    assert(va > 0 && vb > 0)
    assert(JsonDocVersions.readTxnLock(f.a).isEmpty, "the lock must be released")
    assert(!JsonDocVersions.readStaged(f.a, va), "finalized head must be plain published")
    // a second ordinary commit to A proceeds normally afterwards
    JsonDocVersions.commitDelta(f.a, Set.empty, Set("a-epoch2.jsonl"))
    assert(liveA(f) === Set("a-base.jsonl", "a-epoch1.jsonl", "a-epoch2.jsonl"))
  }

  for (step <- 1 to 4) {
    test(s"PROCESS DEATH after step $step: both-or-neither holds; recover converges") {
      val f = fixture()
      val (d1, d2) = deltas(f)
      intercept[GraftTxn2.HardCrash] {
        GraftTxn2.commitTwo(d1, d2,
          failpoint = s => if (s == step) throw new GraftTxn2.HardCrash(s))
      }
      // the joint invariant must hold in the DEAD state itself: steps
      // 1-2 = neither visible; steps 3-4 = both visible (B's CAS was
      // the commit point; A resolves through the decider's ledger)
      assertJoint(f, Some(step >= 3))
      // recovery converges: forward at/after the commit point, back before
      val rolled = GraftTxn2.recover(f.a)
      if (step >= 3) assert(rolled === "forward")
      else assert(rolled === "back")
      assertJoint(f, Some(step >= 3))
      assert(JsonDocVersions.readTxnLock(f.a).isEmpty)
      // and the table is writable again either way
      JsonDocVersions.commitDelta(f.a, Set.empty, Set("a-after.jsonl"))
      assert(liveA(f).contains("a-after.jsonl"))
      // recover is idempotent
      assert(GraftTxn2.recover(f.a) === "clean")
    }
  }

  test("ORDINARY failure (not process death) rolls back inline and unlocks") {
    val f = fixture()
    val (d1, d2) = deltas(f)
    val e = intercept[RuntimeException] {
      GraftTxn2.commitTwo(d1, d2,
        failpoint = s => if (s == 2) throw new RuntimeException("transient"))
    }
    assert(e.getMessage === "transient")
    assertJoint(f, Some(false))
    assert(JsonDocVersions.readTxnLock(f.a).isEmpty,
      "an inline abort must release the lock itself")
    // and a clean retry then succeeds end-to-end
    GraftTxn2.commitTwo(d1, d2)
    assertJoint(f, Some(true))
  }

  test("the lock refuses concurrent ordinary commits and a second coordinator") {
    val f = fixture()
    val (d1, d2) = deltas(f)
    // a dead coordinator after step 2 leaves the lock held
    intercept[GraftTxn2.HardCrash] {
      GraftTxn2.commitTwo(d1, d2, failpoint = s => if (s == 2) throw new GraftTxn2.HardCrash(s))
    }
    val blocked = intercept[IllegalStateException] {
      JsonDocVersions.commitDelta(f.a, Set.empty, Set("racer.jsonl"))
    }
    assert(blocked.getMessage.contains("recover_txn2"), blocked.getMessage)
    val second = intercept[IllegalStateException] {
      GraftTxn2.commitTwo(d1, d2)
    }
    assert(second.getMessage.contains("already in flight"), second.getMessage)
    assert(GraftTxn2.recover(f.a) === "back")
    JsonDocVersions.commitDelta(f.a, Set.empty, Set("racer.jsonl"))
    assert(liveA(f).contains("racer.jsonl"))
  }

  test("A<->B cycle is impossible: B's commit refuses when B itself is locked") {
    val f = fixture()
    // B is the A-side of some other in-flight transaction
    assert(JsonDocVersions.claimTxnLock(f.b, """{"token":"other","decider":"y"}"""))
    val (d1, d2) = deltas(f)
    val e = intercept[IllegalStateException] { GraftTxn2.commitTwo(d1, d2) }
    assert(e.getMessage.contains("recover_txn2"), e.getMessage)
    // the refused coordinator rolled its own side back
    assertJoint(f, Some(false))
    assert(JsonDocVersions.readTxnLock(f.a).isEmpty,
      "a refused coordinator must release its own lock")
    JsonDocVersions.releaseTxnLock(f.b)
  }
}
