package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The OCC retry/conflict contract re-certified against an OBJECT-STORE
  * shaped [[CommitStore]] (r14): an in-memory fake whose `putIfAbsent`
  * can be made to LOSE a race deterministically — a hook runs just
  * before each CAS attempt and can insert a competing manifest for the
  * exact version the committer is about to claim. This pins that the
  * commit logic above the seam (rebase-and-retry for deltas, loud abort
  * for absolute commits, concurrent-rewrite refusal) does not secretly
  * depend on local-filesystem behavior; a cloud deployment only has to
  * implement the five primitives. */
class CommitStoreSpec extends AnyFunSuite {

  /** In-memory store: a (dir, name) -> (content, mtime) map with a
    * race-injection hook invoked before every CAS attempt. */
  final class InMemoryCommitStore extends CommitStore {
    private val files =
      new java.util.concurrent.ConcurrentHashMap[(String, String), (String, Long)]()
    private var tick = 0L
    /** Runs before each putIfAbsent; may itself insert entries. */
    @volatile var beforePut: (String, String) => Unit = (_, _) => ()

    /** Direct insert (the "other writer" in injected races). */
    def forcePut(dir: String, name: String, content: String): Unit =
      files.synchronized { tick += 1; files.put((dir, name), (content, tick)) }

    override def putIfAbsent(dir: String, name: String, content: String): Boolean = {
      beforePut(dir, name)
      files.synchronized {
        tick += 1
        files.putIfAbsent((dir, name), (content, tick)) == null
      }
    }
    override def list(dir: String): Seq[String] =
      files.keySet().toArray(Array.empty[(String, String)])
        .collect { case (d, n) if d == dir => n }.toSeq
    override def read(dir: String, name: String): Option[String] =
      Option(files.get((dir, name))).map(_._1)
    override def mtime(dir: String, name: String): Option[Long] =
      Option(files.get((dir, name))).map(_._2)
    override def delete(dir: String, name: String): Boolean =
      files.remove((dir, name)) != null
  }

  private def withFake[A](body: InMemoryCommitStore => A): A = {
    val fake = new InMemoryCommitStore
    val prev = JsonDocVersions.store
    JsonDocVersions.store = fake
    try body(fake) finally JsonDocVersions.store = prev
  }

  /** A competing committer's manifest for version v of `dir`. */
  private def competingManifest(fake: InMemoryCommitStore, dir: String,
      v: Int, live: Set[String]): Unit =
    fake.forcePut(dir, JsonDocVersions.manifestName(v),
      s"""{"version":$v,"files":[${live.toSeq.sorted.map(n => "\"" + n + "\"").mkString(",")}]}""")

  test("delta commit rebases and retries when the CAS loses: both writers' files land") {
    withFake { fake =>
      val dir = "/mem/t1"
      JsonDocVersions.commit(dir, Set("base.jsonl")) // v1
      // the first CAS attempt (v2) loses to a concurrent append; the
      // retry must rebase onto v2's live set and claim v3 — keeping BOTH
      // writers' files (the lost-update shape the seam exists to prevent)
      var injected = false
      fake.beforePut = (d, name) =>
        if (!injected && name == JsonDocVersions.manifestName(2)) {
          injected = true
          competingManifest(fake, d, 2, Set("base.jsonl", "other.jsonl"))
        }
      val v = JsonDocVersions.commitDelta(dir, Set.empty, Set("mine.jsonl"))
      assert(v == 3, s"losing the v2 race must land as v3, got v$v")
      assert(JsonDocVersions.latest(dir).get._2 ===
        Set("base.jsonl", "other.jsonl", "mine.jsonl"))
    }
  }

  test("delta commit survives a STORM of lost races (one injection per attempt, 5 rounds)") {
    withFake { fake =>
      val dir = "/mem/t2"
      JsonDocVersions.commit(dir, Set("base.jsonl")) // v1
      var races = 0
      fake.beforePut = (d, name) =>
        if (races < 5) {
          races += 1
          val v = name.stripPrefix("_manifest_v").stripSuffix(".json").toInt
          val prevLive = JsonDocVersions.latest(d).get._2
          competingManifest(fake, d, v, prevLive + s"racer$races.jsonl")
        }
      val v = JsonDocVersions.commitDelta(dir, Set.empty, Set("mine.jsonl"))
      assert(v == 7, s"five lost races then a win must land as v7, got v$v")
      val live = JsonDocVersions.latest(dir).get._2
      assert(live.contains("mine.jsonl") && (1 to 5).forall(i => live.contains(s"racer$i.jsonl")))
    }
  }

  test("absolute commit aborts loudly on a lost CAS (no rebase, no silent replace)") {
    withFake { fake =>
      val dir = "/mem/t3"
      JsonDocVersions.commit(dir, Set("base.jsonl")) // v1
      fake.beforePut = (d, name) =>
        if (name == JsonDocVersions.manifestName(2))
          competingManifest(fake, d, 2, Set("base.jsonl", "other.jsonl"))
      intercept[java.util.ConcurrentModificationException] {
        JsonDocVersions.commit(dir, Set("base.jsonl", "mine.jsonl"))
      }
      // the competing committer's manifest is untouched
      assert(JsonDocVersions.latest(dir).get._2 === Set("base.jsonl", "other.jsonl"))
    }
  }

  test("conflicting rewrite is refused across the fake: a raced-away retired file aborts") {
    withFake { fake =>
      val dir = "/mem/t4"
      JsonDocVersions.commit(dir, Set("a.jsonl", "b.jsonl")) // v1
      // while this committer retires a.jsonl, a concurrent OPTIMIZE wins
      // v2 having ALREADY retired it — merging both would duplicate rows
      fake.beforePut = (d, name) =>
        if (name == JsonDocVersions.manifestName(2))
          competingManifest(fake, d, 2, Set("compact.jsonl", "b.jsonl"))
      val e = intercept[java.util.ConcurrentModificationException] {
        JsonDocVersions.commitDelta(dir, Set("a.jsonl"), Set("rewritten-a.jsonl"))
      }
      assert(e.getMessage.contains("concurrent rewrite won"))
    }
  }

  test("txn map carries forward across raced commits") {
    withFake { fake =>
      val dir = "/mem/t5"
      JsonDocVersions.commit(dir, Set("base.jsonl"), txn = Some(("app", 7L))) // v1
      var injected = false
      fake.beforePut = (d, name) =>
        if (!injected && name == JsonDocVersions.manifestName(2)) {
          injected = true
          competingManifest(fake, d, 2, Set("base.jsonl", "other.jsonl"))
        }
      // NOTE the injected competitor carries no txns (a foreign append
      // built from the same v1 would have copied them; this is the
      // worst case) — the retry re-reads v2's txn map, so the app's
      // ledger entry is refreshed by this commit's own txn
      JsonDocVersions.commitDelta(dir, Set.empty, Set("mine.jsonl"), txn = Some(("app", 8L)))
      assert(JsonDocVersions.lastTxn(dir, "app").contains(8L))
    }
  }

  test("GraftTxn contract: one pending txn per table; crash-retry of one applier is exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_txn").toString
    GraftTxn.begin(dir, "app", 1L)
    // a second pending declaration on the same table is refused loudly
    val e = intercept[IllegalArgumentException] { GraftTxn.begin(dir, "app", 2L) }
    assert(e.getMessage.contains("already pending"))
    assert(GraftTxn.take(dir).contains(("app", 1L)) && GraftTxn.take(dir).isEmpty)

    // the crash-retry loop of ONE applier (the in-contract shape):
    // check lastTxn -> apply -> the commit folds the epoch atomically
    // with the live set; a replay sees the epoch and skips. A crash
    // BETWEEN apply and commit re-applies — and commits the same state.
    def applyEpochOnce(epoch: Long, file: String): Boolean =
      if (JsonDocVersions.lastTxn(dir, "app").exists(_ >= epoch)) false
      else {
        JsonDocVersions.commitDelta(dir, Set.empty, Set(file), txn = Some(("app", epoch)))
        true
      }
    assert(applyEpochOnce(1L, "e1.jsonl"))
    assert(!applyEpochOnce(1L, "e1-replay.jsonl"), "a replayed epoch must skip")
    assert(applyEpochOnce(2L, "e2.jsonl"))
    assert(JsonDocVersions.latest(dir).get._2 === Set("e1.jsonl", "e2.jsonl"))
    assert(JsonDocVersions.lastTxn(dir, "app").contains(2L))
    // what per-JVM state cannot give: two CONCURRENT appliers of one
    // (table, appId) both pass the lastTxn check before either commits —
    // closed (r15) by the opt-in begin-token CAS, pinned below
  }

  test("claimEpoch closes the two-concurrent-appliers window: loud refusal, never a double fold") {
    val dir = java.nio.file.Files.createTempDirectory("graft_claim").toString
    // applier A claims epoch 1 and applies
    assert(GraftTxn.claimEpoch(dir, "mv", 1L))
    // applier B arrives MID-APPLY: the bare lastTxn check would admit it
    // (nothing committed yet) — the claim refuses it loudly instead
    val e = intercept[IllegalStateException] { GraftTxn.claimEpoch(dir, "mv", 1L) }
    assert(e.getMessage.contains("one applier per"), e.getMessage)
    // A commits (ledger entry rides the manifest CAS) and releases
    JsonDocVersions.commitDelta(dir, Set.empty, Set("e1.jsonl"), txn = Some(("mv", 1L)))
    GraftTxn.releaseEpochClaim(dir, "mv")
    // a replay of epoch 1 now screens out at the ledger, claim-free
    assert(!GraftTxn.claimEpoch(dir, "mv", 1L), "an applied epoch must not re-claim")
    // epoch 2 proceeds normally
    assert(GraftTxn.claimEpoch(dir, "mv", 2L))
    JsonDocVersions.commitDelta(dir, Set.empty, Set("e2.jsonl"), txn = Some(("mv", 2L)))
    GraftTxn.releaseEpochClaim(dir, "mv")
    assert(JsonDocVersions.latest(dir).get._2 === Set("e1.jsonl", "e2.jsonl"))
  }

  test("claimEpoch liveness: a DEAD claimer blocks its own epoch loudly; an older-epoch claim sweeps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_claim2").toString
    // a claimer of epoch 5 dies mid-apply (claim left, no commit)
    assert(GraftTxn.claimEpoch(dir, "mv", 5L))
    val blocked = intercept[IllegalStateException] { GraftTxn.claimEpoch(dir, "mv", 5L) }
    assert(blocked.getMessage.contains("clearEpochClaim"), blocked.getMessage)
    // the documented recovery releases it; the retry then applies once
    GraftTxn.clearEpochClaim(dir, "mv")
    assert(GraftTxn.claimEpoch(dir, "mv", 5L))
    JsonDocVersions.commitDelta(dir, Set.empty, Set("e5.jsonl"), txn = Some(("mv", 5L)))
    // NOTE: release deliberately skipped — the next epoch's claim must
    // sweep the stale OLDER token automatically (the lineage moved on)
    assert(GraftTxn.claimEpoch(dir, "mv", 6L),
      "an older epoch's leftover claim is provably dead and must sweep")
    // and a STALE lineage member asking for an older epoch backs off
    assert(!GraftTxn.claimEpoch(dir, "mv", 5L))
    GraftTxn.releaseEpochClaim(dir, "mv")
  }

  test("mtime ordering drives TIMESTAMP AS OF resolution on the fake store") {
    withFake { _ =>
      val dir = "/mem/t6"
      JsonDocVersions.commit(dir, Set("a.jsonl"))
      JsonDocVersions.commit(dir, Set("a.jsonl", "b.jsonl"))
      val t1 = JsonDocVersions.mtime(dir, 1).get
      val t2 = JsonDocVersions.mtime(dir, 2).get
      assert(t1 < t2)
      assert(JsonDocVersions.resolveAt(dir, t1).contains(1))
      assert(JsonDocVersions.resolveAt(dir, t2).contains(2))
      assert(JsonDocVersions.resolveAt(dir, t1 - 1).isEmpty)
    }
  }
}
