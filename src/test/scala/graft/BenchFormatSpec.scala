package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The driver records only the final ~2000 chars of bench stdout, then
  * parses a JSON line out of that tail. BENCH_r03 and BENCH_r04 both came
  * back parsed:null because the full-name per-query map outgrew the
  * window and lost its leading '{'. These tests pin the fix: the LAST
  * printed line is compact enough to always sit whole inside the tail.
  */
class BenchFormatSpec extends AnyFunSuite {

  /** Tail budget: 2000-char driver capture minus headroom for whatever
    * sbt prints after our line ("[success] Total time: ..." is ~85
    * chars; allow 260 — the r14 195-row board needed some of the
    * original 300-char slack back). */
  private val TailBudget = 1740

  private def fakeTimes(names: Iterable[String]): Seq[(String, Double)] =
    names.toSeq.map(n => n -> 123.456) // worst-ish per-entry width

  /** The REALISTIC board profile (r15 — the 203-row renegotiation): on
    * every committed board the majority of rows are sub-second, a third
    * are a few seconds, a handful reach ~10 s. Past ~200 rows no gear
    * can keep 200 × ~9 bytes of 2-digit entries inside the tail, so the
    * contract becomes: at THIS profile the map survives — the dropZeros
    * gear sheds exactly the rows whose integer rendering is "0", which
    * carry no baseline signal (drifted() guards their regressions with
    * the absolute trip wire instead). Uniform-heavy boards keep the
    * always-parseable total. */
  private def realisticTimes(names: Iterable[String]): Seq[(String, Double)] =
    names.toSeq.zipWithIndex.map { case (n, i) =>
      n -> (i % 10 match {
        case k if k <= 5 => 0.31  // renders "0" at decimals=0
        case 6 | 7 | 8 => 2.34
        case _ => 9.51
      })
    }

  test("compact line for the real query surface fits the driver tail window") {
    // uniform worst-ish 3-digit seconds: past ~165 rows no gear can keep
    // a 10-bytes/entry map inside the tail, so the map sheds BY DESIGN
    // (same rationale as the sentinel test below) — what must hold
    // unconditionally is a whole, parseable line carrying the total
    val line = Bench.compactLine(fakeTimes(SparkEntry.queries.keys), "/root/testdata/sf0.1")
    assert(line.length < TailBudget,
      s"compact bench line is ${line.length} chars — exceeds the $TailBudget tail budget")
    val j = JsonMethods.parse(line)
    assert((j \ "total") != JNothing)
    // at the realistic profile the per-query map must SURVIVE: an empty
    // map means the driver loses per-query timings and drift baselining
    val real = JsonMethods.parse(Bench.compactLine(
      realisticTimes(SparkEntry.queries.keys), "/root/testdata/sf0.1"))
    assert((real \ "queries") != JObject(Nil),
      s"per-query map dropped at ${SparkEntry.queries.size} queries / realistic profile — widen the budget gears")
  }

  test("compact line fits the tail window WITH the five trailing sentinel repeats") {
    // the default-on sentinel mode appends five "qNN#2" rows to the
    // board. Realistic worst case (2-digit seconds — slowest real board
    // rows are ~11 s; a uniformly >100 s board is a catastrophe the
    // total reports regardless): the per-query map must survive. The
    // uniform 3-digit case may shed the map past ~165 rows by design —
    // asserted parseable-with-total below, not map-carrying.
    val names = SparkEntry.queries.keys.toSeq
    val sentinels = names.take(5).map(n =>
      n.takeWhile(_ != '_') + "#2" + n.dropWhile(_ != '_'))
    val line = Bench.compactLine(
      realisticTimes(names) ++ sentinels.map(_ -> 9.51), "/root/testdata/sf0.1")
    assert(line.length < TailBudget,
      s"compact line with sentinels is ${line.length} chars — exceeds $TailBudget")
    val j = JsonMethods.parse(line)
    assert((j \ "queries") != JObject(Nil),
      s"per-query map dropped at ${names.size + 5} rows — widen the budget gears")
    val worst = JsonMethods.parse(
      Bench.compactLine(fakeTimes(names ++ sentinels), "/root/testdata/sf0.1"))
    assert((worst \ "total") != JNothing && (worst \ "n_queries") == JInt(names.size + 5))
  }

  test("compact line fits with #2 sentinels AND #3 median-escalation rows (r15)") {
    // median-of-3 (verdict item 7): a sentinel diverging >1.5x from its
    // primary triggers a third repeat. Worst realistic case: all five
    // hot rows diverge, so the board carries 5 "#2" + 5 "#3" rows.
    val names = SparkEntry.queries.keys.toSeq
    val extra = names.take(5).flatMap(n => Seq("#2", "#3").map(s =>
      n.takeWhile(_ != '_') + s + n.dropWhile(_ != '_')))
    val line = Bench.compactLine(
      realisticTimes(names) ++ extra.map(_ -> 9.51), "/root/testdata/sf0.1")
    assert(line.length < TailBudget,
      s"compact line with #2+#3 rows is ${line.length} chars — exceeds $TailBudget")
    val j = JsonMethods.parse(line)
    assert((j \ "queries") != JObject(Nil))
    // the lean gears shed every '#' row, #3 included, and previousBench
    // never baselines against a repeat
    assert(!line.contains("#") || (j \ "queries").toString.contains("#2"),
      "lean gears must shed #3 rows exactly like #2 rows")
  }

  test("compact line stays inside the budget even at 200 queries (map-drop fallback)") {
    val names = (1 to 200).map(i => f"q$i%03d_some_descriptive_operator_name")
    val line = Bench.compactLine(fakeTimes(names), "/root/testdata/sf0.1")
    assert(line.length <= TailBudget, s"${line.length} chars at 200 queries")
    // the fallback must still carry the headline total, parseable
    val j = JsonMethods.parse(line)
    assert((j \ "n_queries") == JInt(200))
    assert((j \ "total") != JNothing)
  }

  test("compact line fits the tail window with hot-5 AND the full drift-repeat cap") {
    val names = SparkEntry.queries.keys.toSeq
    val repeats = names.take(13).map(n => // 5 hot + up to 8 drifted
      n.takeWhile(_ != '_') + "#2" + n.dropWhile(_ != '_'))
    // realistic profile here, not the uniform worst case the hot-5 test
    // uses: at 200+ rows a uniformly-slow board MAY shed the map (the
    // total always survives — asserted below), but the realistic
    // distribution must keep per-query visibility for every non-zero row
    val line = Bench.compactLine(
      realisticTimes(names) ++ repeats.map(_ -> 9.51), "/root/testdata/sf0.1")
    assert(line.length < TailBudget,
      s"compact line with 13 repeats is ${line.length} chars — exceeds $TailBudget")
    val j = JsonMethods.parse(line)
    assert((j \ "queries") != JObject(Nil),
      s"per-query map dropped at ${names.size + 13} rows — widen the budget gears")
    // and even at the 3-digit worst case the line parses with its total
    val worst = JsonMethods.parse(
      Bench.compactLine(fakeTimes(names ++ repeats), "/root/testdata/sf0.1"))
    assert((worst \ "total") != JNothing && (worst \ "n_queries") == JInt(names.size + 13))
    // r13: the drift cap is gone — the pathological board where EVERY
    // query drifts doubles the row count. The line must stay inside the
    // tail window and keep its total (per-query visibility MAY shed at
    // this extreme; the gears' documented last resort)
    val allDrift = names ++ names.map(n =>
      n.takeWhile(_ != '_') + "#2" + n.dropWhile(_ != '_'))
    val extreme = Bench.compactLine(allDrift.map(_ -> 45.678), "/root/testdata/sf0.1")
    assert(extreme.length < TailBudget,
      s"all-drifted compact line is ${extreme.length} chars — exceeds $TailBudget")
    val je = JsonMethods.parse(extreme)
    // the headline ("value") always lands; r14's minimal gear may keep
    // the map at this extreme (strictly better than the old map-drop
    // fallback, which carried n_queries instead)
    assert((je \ "value") != JNothing)
    assert((je \ "queries") != JObject(Nil) || (je \ "n_queries") == JInt(allDrift.size))
  }

  test("previousBench takes the per-query minimum over the last K rounds; drift rule fires correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prevbench").toFile
    def write(n: Int, tail: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(dir, s"BENCH_r$n.json").toPath,
        s"""{"n":$n,"rc":0,"tail":${org.json4s.jackson.JsonMethods.compact(org.json4s.JString(tail))}}""")
    // round 3 is OUTSIDE the default K=4 window (rounds 4-7 exist) —
    // its 9.0 for "01" must not leak in; within the window the minimum
    // wins ("01" is 2.0 in r7 but 1.5 in r5)
    write(3, "{\"metric\":\"total\",\"value\":9,\"queries\":{\"01\":9.0,\"77\":0.1},\"total\":9}\n")
    write(4, "{\"metric\":\"total\",\"value\":9,\"queries\":{\"01\":3.0},\"total\":9}\n")
    write(5, "{\"metric\":\"total\",\"value\":9,\"queries\":{\"01\":1.5},\"total\":9}\n")
    write(6, "{\"metric\":\"total\",\"value\":9,\"queries\":{\"01\":1.8},\"total\":9}\n")
    write(7, "noise head {\"metric\":\"total\",\"value\":1,\"queries\":" +
      "{\"01\":2.0,\"41\":1.9,\"119#2\":6.2,\"10b\":1},\"total\":1}\n[success]")
    val prev = Bench.previousBench(dir.getAbsolutePath)
    // r14: keys normalize zero-stripped ("01" from older rounds -> "1")
    assert(prev == Map("1" -> 1.5, "41" -> 1.9, "10b" -> 1.0),
      s"per-query min over rounds 4-7, sentinel keys excluded, r3 outside the window: $prev")
    // the anti-creep property this exists for (r11 verdict item 5): a
    // ~1.3x/round creep never trips against the immediately previous
    // round but compounds past the band against the rolling minimum
    val creep = Seq("q01_pricing_creep" -> 2.4) // 1.2x vs r7's 2.0 — but 1.6x and +0.9 vs the min 1.5
    assert(Bench.drifted(creep, Map("1" -> 2.0), Set.empty).isEmpty,
      "vs the last round alone the creep is invisible (the old rule)")
    assert(Bench.drifted(creep, prev, Set.empty) == Seq("q01_pricing_creep"),
      "vs the rolling minimum the compounded creep must trip a repeat")
    // drift: needs BOTH 1.5x and +0.8s — the sub-second noise band
    // (0.2 -> 0.5) trips the ratio but not the floor; q41's real r10
    // drift (1.9 -> 3.2) trips both
    val board = Seq("q41_string_funcs" -> 3.2, "q01_pricing" -> 2.3,
      "q10b_hll" -> 0.5, "q99_new_query" -> 50.0)
    val d = Bench.drifted(board, prev, exclude = Set.empty)
    // r15: a key ABSENT from a non-empty baseline is treated as the
    // sub-quantum case (the dropZeros gear sheds zero-rendered rows
    // from the compact map, so absence can mean "was sub-0.5 s", not
    // only "is new") — q99 at 50 s trips the absolute wire and ranks
    // by raw time, ahead of q41's 1.7x ratio
    assert(d == Seq("q99_new_query", "q41_string_funcs"),
      s"expected q99 (absent baseline, >5s wire) then q41 (1.7x drift), got $d: " +
        "q01 +0.3 under floor, q10b shrank")
    // hot-set exclusion: a query already repeating as a hot sentinel
    // must not repeat twice
    assert(Bench.drifted(board, prev,
      exclude = Set("q41_string_funcs", "q99_new_query")).isEmpty)
    // a decimals=0 compact line rounds sub-0.5 s queries to baseline
    // 0.0 — that is no baseline, not a 0-second one: a steady ~1 s
    // query must NOT drift-trip against it (pre-fix: t > 1.5*0 &&
    // t > 0.8 flagged it every round at ratio Infinity)
    assert(Bench.drifted(Seq("q07_rank_windows" -> 1.0),
      Map("7" -> 0.0), Set.empty).isEmpty,
      "a zero (rounded-away) baseline must never trip the drift rule")
    // ... but a rounded-away baseline must not blind the guard either
    // (r12 advice): a sub-quantum query regressing past the absolute
    // 5 s wire still trips, ranked by raw time
    assert(Bench.drifted(Seq("q07_rank_windows" -> 30.0),
      Map("7" -> 0.0), Set.empty) == Seq("q07_rank_windows"),
      "a 0.4s -> 30s regression must trip the absolute fallback wire")
    assert(Bench.drifted(Seq("q07_rank_windows" -> 4.9),
      Map("7" -> 0.0), Set.empty).isEmpty,
      "below the absolute wire a sub-quantum row stays quiet")
    // absent history -> no repeats, never an abort
    assert(Bench.drifted(board, Map.empty, Set.empty).isEmpty)
    assert(Bench.previousBench(java.nio.file.Files.createTempDirectory("graft_nope").toString).isEmpty)
  }

  test("the final line is the ADJUDICATED board: sentinels fold, phantom movers die (r16)") {
    // primary + one repeat: MIN (a repeat back at band = the primary was
    // machine noise); primary + #2 + #3: MEDIAN (the divergent-pair
    // escalation); untouched rows pass through; base-name order kept
    val raw = Seq(
      "q01_fast" -> 0.5,
      "q182_kcore" -> 25.0, // loaded-machine spike...
      "q31_lsh" -> 2.0,
      "q182#2_kcore" -> 3.9, // ...its repeat lands at band
      "q119_pagerank" -> 8.0,
      "q119#2_pagerank" -> 20.0, // divergent pair...
      "q119#3_pagerank" -> 9.0) // ...median of 3 decides
    val adj = Bench.adjudicated(raw)
    assert(adj === Seq("q01_fast" -> 0.5, "q182_kcore" -> 3.9,
      "q31_lsh" -> 2.0, "q119_pagerank" -> 9.0))
    // the adjudicated line parses, carries NO sentinel keys, and its
    // total is the adjudicated sum — the artifact the driver captures
    val line = Bench.compactLine(adj, "/root/testdata/sf0.1")
    assert(line.length < TailBudget)
    val j = JsonMethods.parse(line)
    val keys = (j \ "queries") match {
      case JObject(kv) => kv.map(_._1)
      case _ => Nil
    }
    assert(keys.nonEmpty && keys.forall(!_.contains("#")))
    val total = (j \ "value") match {
      case JDouble(v) => v
      case JDecimal(v) => v.toDouble
      case JInt(v) => v.toDouble
      case _ => -1.0
    }
    assert(math.abs(total - 15.4) < 0.01)
  }

  test("short keys remain unique across the real query surface") {
    val names = SparkEntry.queries.keys.toSeq
    val short = names.map(Bench.shortKey)
    val dups = short.groupBy(identity).filter(_._2.size > 1).keys
    assert(short.distinct.size == names.size,
      s"short-key collision(s): ${dups.mkString(", ")} — rename the colliding queries")
  }

  test("both lines parse as JSON with matching totals and full per-query maps") {
    val times = Seq("q01_alpha" -> 1.0, "q02_beta" -> 2.5, "q10b_gamma" -> 0.25)
    val full = JsonMethods.parse(Bench.fullLine(times, "/sf"))
    val compact = JsonMethods.parse(Bench.compactLine(times, "/sf"))
    def d(j: JValue, k: String): Double =
      (j \ k) match { case JDouble(x) => x; case JInt(x) => x.toDouble; case other => fail(s"$k: $other") }
    assert(d(full, "total") == 3.75 && d(compact, "total") == 3.75)
    assert(d(full, "value") == 3.75 && d(compact, "value") == 3.75)
    assert((full \ "n_queries") == JInt(3) && (compact \ "n_queries") == JInt(3))
    val JObject(fq) = (full \ "queries"): @unchecked
    val JObject(cq) = (compact \ "queries"): @unchecked
    assert(fq.map(_._1) == List("q01_alpha", "q02_beta", "q10b_gamma"))
    // compact keys are the board numbers without the redundant "q"
    // prefix (r9) or leading zeros (r14) — "2" maps to q02 unambiguously
    assert(cq.map(_._1) == List("1", "2", "10b"))
    assert(d(compact \ "queries", "2") == 2.5)
  }
}
