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

  // ---- N = 3 (r16, verdict item 8): two staged participants, one decider

  private case class Fixture3(a1: String, a2: String, d: String)

  private def fixture3(): Fixture3 = {
    def mk(tag: String): String = {
      val p = java.nio.file.Files.createTempDirectory(s"graft_txn3_$tag").toString
      JsonDocVersions.commitDelta(p, Set.empty, Set(s"$tag-base.jsonl"))
      p
    }
    Fixture3(mk("a1"), mk("a2"), mk("d"))
  }

  private def deltas3(f: Fixture3) = (
    Seq(GraftTxn2.Delta(f.a1, Set.empty, Set("a1-epoch1.jsonl")),
      GraftTxn2.Delta(f.a2, Set.empty, Set("a2-epoch1.jsonl"))),
    GraftTxn2.Delta(f.d, Set.empty, Set("d-epoch1.jsonl")))

  /** The N-way invariant: ALL THREE flip together or none does. */
  private def assertJoint3(f: Fixture3, committed: Option[Boolean] = None): Unit = {
    val in = Seq(
      JsonDocVersions.latest(f.a1).get._2.contains("a1-epoch1.jsonl"),
      JsonDocVersions.latest(f.a2).get._2.contains("a2-epoch1.jsonl"),
      JsonDocVersions.latest(f.d).get._2.contains("d-epoch1.jsonl"))
    assert(in.distinct.size == 1,
      s"ATOMICITY BROKEN across 3 tables: (a1, a2, d) committed = $in")
    committed.foreach(c => assert(in.head === c,
      s"expected committed=$c, observed $in"))
  }

  test("N=3 happy path: all three flip together; locks released; heads plain") {
    val f = fixture3()
    val (ds, dd) = deltas3(f)
    assertJoint3(f, Some(false))
    val (pubs, vd) = GraftTxn2.commitN(ds, dd)
    assertJoint3(f, Some(true))
    assert(pubs.size === 2 && pubs.forall(_ > 0) && vd > 0)
    for (p <- Seq(f.a1, f.a2)) {
      assert(JsonDocVersions.readTxnLock(p).isEmpty)
      assert(!JsonDocVersions.readStaged(p, JsonDocVersions.latestVersion(p).get))
      JsonDocVersions.commitDelta(p, Set.empty, Set("after.jsonl"))
      assert(JsonDocVersions.latest(p).get._2.contains("after.jsonl"))
    }
  }

  for (step <- 1 to 4) {
    test(s"N=3 PROCESS DEATH after step $step: all-or-nothing holds; recover converges") {
      val f = fixture3()
      val (ds, dd) = deltas3(f)
      intercept[GraftTxn2.HardCrash] {
        GraftTxn2.commitN(ds, dd,
          failpoint = s => if (s == step) throw new GraftTxn2.HardCrash(s))
      }
      // the DEAD state itself: steps 1-2 = none visible; steps 3-4 =
      // all visible (the decider's single CAS carried every
      // participant's ledger entry — one linearization step for all)
      assertJoint3(f, Some(step >= 3))
      // recovery converges PER PARTICIPANT, in any order, idempotently
      for (p <- Seq(f.a2, f.a1)) {
        val rolled = GraftTxn2.recover(p)
        assert(rolled === (if (step >= 3) "forward" else "back"), s"$p: $rolled")
      }
      assertJoint3(f, Some(step >= 3))
      for (p <- Seq(f.a1, f.a2)) {
        assert(JsonDocVersions.readTxnLock(p).isEmpty)
        assert(GraftTxn2.recover(p) === "clean")
        JsonDocVersions.commitDelta(p, Set.empty, Set("after.jsonl"))
      }
    }
  }

  test("N=3 mid-stage ordinary failure rolls back EVERY staged participant inline") {
    val f = fixture3()
    val (ds, dd) = deltas3(f)
    // fail after stage (step 2): a1 AND a2 both carry staged manifests
    val e = intercept[RuntimeException] {
      GraftTxn2.commitN(ds, dd,
        failpoint = s => if (s == 2) throw new RuntimeException("transient"))
    }
    assert(e.getMessage === "transient")
    assertJoint3(f, Some(false))
    for (p <- Seq(f.a1, f.a2))
      assert(JsonDocVersions.readTxnLock(p).isEmpty,
        s"inline abort must unlock $p")
    // a clean retry then lands end-to-end
    GraftTxn2.commitN(ds, dd)
    assertJoint3(f, Some(true))
  }

  test("N=3 partial lock failure releases the locks already taken") {
    val f = fixture3()
    val (ds, dd) = deltas3(f)
    // a2 is busy with some other coordinator
    assert(JsonDocVersions.claimTxnLock(f.a2, """{"token":"other","decider":"y"}"""))
    val e = intercept[IllegalStateException] { GraftTxn2.commitN(ds, dd) }
    assert(e.getMessage.contains("already in flight"))
    assert(JsonDocVersions.readTxnLock(f.a1).isEmpty,
      "the first participant's lock must be released on the abort")
    assertJoint3(f, Some(false))
    JsonDocVersions.releaseTxnLock(f.a2)
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
