package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** k-core (q182): the DuckDB oracle pins the unrolled 24-round peel
  * cross-engine; this spec (a) proves the PEELING MECHANISM on
  * constructed graphs where the fixpoint is known by hand and takes
  * multiple rounds, and (b) replays the ENTIRE q182 — support-ranked
  * edge cap included — driver-side from raw lineitem rows, pinning the
  * exact (node, core_deg) set and the non-vacuity facts (core nonempty;
  * peeling removes nodes BEYOND the initial degree filter, so the loop,
  * not the filter, is what the board row certifies). */
class KCoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    import spark.implicits._
    val df = Caches.register(edges.toDF("u", "v").cache())
    val out = ops.Advanced.kCore(df, k, 24).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.drain()
    out
  }

  /** Reference peel: textbook set iteration over an in-memory edge list. */
  private def peelRef(edges: Seq[(Long, Long)], k: Int): (Map[Long, Int], Int) = {
    def degrees(alive: Set[Long]): Map[Long, Int] =
      edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, xs) => n -> xs.length }
    var alive = degrees(edges.flatMap(e => Seq(e._1, e._2)).toSet)
      .filter(_._2 >= k).keySet
    var rounds = 0
    var done = false
    while (!done) {
      val next = degrees(alive).filter(_._2 >= k).keySet
      if (next == alive) done = true else { alive = next; rounds += 1 }
    }
    (degrees(alive), rounds)
  }

  test("k=2 on a path: peels to empty from the ends, one node pair per round") {
    // 1-2-3-...-8: every interior node has degree 2 until an end falls off
    val path = (1L to 7L).map(i => (i, i + 1))
    assert(run(path, 2).isEmpty)
    assert(peelRef(path, 2)._2 >= 3, "the reference peel itself is multi-round")
  }

  test("k=3 on a clique with a pendant path: multi-round peel ends at exactly the clique") {
    val clique = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val tail = Seq((5L, 6L), (6L, 7L), (7L, 8L))
    val got = run(clique ++ tail, 3)
    // 8 falls (deg 1), then 7, then 6 — three genuine rounds — and the
    // K5 survives with every core degree restored to 4
    assert(got == (1L to 5L).map(_ -> 4L).toMap)
  }

  test("seeded pseudo-random graph matches the reference peel at k=3") {
    // deterministic LCG so the case is replayable
    var s = 12345L
    def nxt(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s }
    val edges = (1 to 600).map { _ => (nxt() % 80, nxt() % 80) }
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val (ref, _) = peelRef(edges, 3)
    assert(run(edges, 3) == ref.map { case (n, d) => n -> d.toLong })
  }

  test("q182 replay from raw lineitem: exact core, nonempty, and peeling beats the degree filter") {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val inCap = items.groupBy(_._1).filter(_._2.size <= 20).values.flatten.toSeq
    val byOk = inCap.groupBy(_._1)
    val sup = byOk.values.flatMap { rows =>
      val pks = rows.map(_._2).toSeq
      for (a <- pks; b <- pks if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size) }.toSeq
    val budget = (4L * inCap.map(_._2).distinct.size).toInt
    val capped = sup.sortBy { case (u, v, c) => (-c, u, v) }.take(budget).map(t => (t._1, t._2))
    val (ref, rounds) = peelRef(capped, 5)
    assert(ref.nonEmpty, "core nonempty at sf0.001")
    assert(rounds >= 1, "the peel loop removes nodes beyond the initial degree filter")
    val got = ops.Advanced.q182KCore(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.drain()
    assert(got == ref.map { case (n, d) => n -> d.toLong })
  }
}
