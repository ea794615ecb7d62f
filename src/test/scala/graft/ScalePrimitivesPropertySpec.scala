package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the scale primitives added in r7 — generated
  * inputs checked against independent driver-side models (the
  * CaicPropertySpec pattern: seeded sampling, one DataFrame per
  * property). These pin the *algebraic* guarantees the oracle queries
  * exercise only at one data distribution: Morton-code bijectivity and
  * tile ordering, Bloom's no-false-negative law under arbitrary key
  * sets, and CMS's one-sided error under adversarial duplication. */
class ScalePrimitivesPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(1337L)).get

  /** Driver-side Morton model: interleave via bit loop. */
  private def mortonModel(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue equals the bit-loop model on random 16-bit points and is a bijection") {
    import spark.implicits._
    val pts = sample(Gen.zip(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)), 2000)
      .distinct
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), ops.Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    out.foreach { case ((x, y), z) =>
      assert(z == mortonModel(x, y, 16), s"($x,$y)")
    }
    // injective on distinct points (the interleave loses no bits)
    assert(out.map(_._2).distinct.length == pts.length)
  }

  test("bloom never false-negatives on arbitrary unicode-ish keys; merge is commutative") {
    import spark.implicits._
    val keys = sample(Gen.oneOf(
      Gen.alphaNumStr.map("k" + _),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.listOfN(3, Gen.oneOf("α", "β", "…", "\u0000", "'", "\"")).map(_.mkString)), 1500)
      .distinct
    val df = keys.toDF("k")
    val (h1, h2) = (df.limit(700), df.exceptAll(df.limit(700)))
    val m12 = dedup.Bloom.mergeBlocks(dedup.Bloom.buildBlocks(h1), dedup.Bloom.buildBlocks(h2))
    val m21 = dedup.Bloom.mergeBlocks(dedup.Bloom.buildBlocks(h2), dedup.Bloom.buildBlocks(h1))
    assert(m12.except(m21).isEmpty && m21.except(m12).isEmpty)
    val missed = dedup.Bloom.probe(df, "k", m12).where(!col("bloom_hit")).count()
    assert(missed == 0L)
  }

  test("CMS estimate is >= true count for every key in a skewed multiset") {
    import spark.implicits._
    // adversarial duplication: zipf-ish repeats of a small key space
    val items = sample(Gen.frequency(
      (8, Gen.const("hot")),
      (4, Gen.oneOf("w1", "w2", "w3")),
      (1, Gen.alphaNumStr.map("c" + _))), 4000)
    val df = items.toDF("k")
    val sk = sketch.CountMin.build(df)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ests = sketch.CountMin
      .estimate(df.distinct(), "k", sk)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(ests.nonEmpty)
    ests.foreach { case (k, est) =>
      assert(est >= truth(k), s"under-estimate for '$k': $est < ${truth(k)}")
    }
  }

  test("bitmap cube (block, bit) stays a bijection over signed user ids — retention equals the set model") {
    import spark.implicits._
    // adversarial id space: negatives, zero, block boundaries (±63,
    // ±64, ±65), and random signed ids — truncating division with
    // sign-following modulo would collide e.g. -1 with 63
    val ids = (Seq(-130L, -65L, -64L, -63L, -1L, 0L, 1L, 63L, 64L, 65L, 130L) ++
      sample(Gen.chooseNum(-5000L, 5000L), 200)).distinct
    val d0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val d1 = java.sql.Timestamp.valueOf("2024-03-02 10:00:00")
    // day 1: all ids; day 2: every third id (deterministic subset)
    val rows = ids.map(u => (u, d0)) ++ ids.filter(_ % 3 == 0).map(u => (u, d1))
    val got = ops.TimeSeries.retentionFromBlocks(
        ops.TimeSeries.bitmapBlocksOf(rows.toDF("user_id", "ts")))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val retained = ids.count(_ % 3 == 0).toLong
    assert(got == Seq((ids.size.toLong, retained), (retained, 0L)),
      s"bitmap retention over signed ids diverged from the set model: $got " +
        s"(expected active ${ids.size} retaining $retained, then $retained retaining 0)")
  }

  test("intervalOverlapPairs equals the naive theta join on random interval sets at random bin widths") {
    import spark.implicits._
    // closed intervals with adversarial shapes: zero-length points,
    // spans many times the bin width, shared endpoints; bin widths from
    // 1 (every pair via its own greatest-start bin) to far beyond the
    // time range (everything in bin 0)
    // starts straddle 0: pre-1970 epochs exercise the floor-division
    // binning (truncate-toward-zero `div` would split the bin at 0 and
    // drop or duplicate pairs there)
    val iv = for {
      s <- Gen.chooseNum(-250L, 250L)
      len <- Gen.frequency(3 -> Gen.const(0L), 5 -> Gen.chooseNum(1L, 40L), 2 -> Gen.chooseNum(41L, 400L))
    } yield (s, s + len)
    for ((binUs, seed) <- Seq(1L -> 1L, 7L -> 2L, 64L -> 3L, 100L -> 4L, 10000L -> 5L)) {
      val as = Gen.listOfN(60, iv).apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val bs = Gen.listOfN(60, iv).apply(Gen.Parameters.default, Seed(seed + 100)).get
        .zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val a = as.toDF("a_id", "s_a", "e_a")
      val b = bs.toDF("b_id", "s_b", "e_b")
      val got = ops.TimeSeries.intervalOverlapPairs(a, b, binUs)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      val naive = (for {
        (ai, sa, ea) <- as; (bi, sb, eb) <- bs
        if sa <= eb && sb <= ea
      } yield (ai, bi)).sorted
      assert(got == naive, s"binUs=$binUs: ${got.size} vs ${naive.size} pairs")
      assert(got.distinct == got, s"binUs=$binUs produced duplicate pairs")
    }
  }

  test("intervalOverlapPairs on the adversarial shape: heavy-tailed lengths + a hot bin, two widths") {
    import spark.implicits._
    // the IntervalSkewStress corpus at sbt-test scale: 1% of intervals
    // span 100-300 bins (heavy tail), 15% of probe starts collapse
    // into bin 0 (the storm). Deterministic (content-hash), so this is
    // the same shape the manual stress tool measures at 500k.
    val binUs = 1000L
    val a = IntervalSkewStress.intervals(spark, 3000L, binUs, 50, "a", 0.0, 11)
    val b = IntervalSkewStress.intervals(spark, 300L, binUs, 50, "b", 0.15, 77)
    val as = a.as[(Long, Long, Long)].collect()
    val bs = b.as[(Long, Long, Long)].collect()
    val naive = (for {
      (ai, sa, ea) <- as; (bi, sb, eb) <- bs
      if sa <= eb && sb <= ea
    } yield (ai, bi)).sorted.toSeq
    assert(naive.size > 1000, s"adversarial corpus too sparse (${naive.size} pairs)")
    for (w <- Seq(binUs / 4, binUs, binUs * 4)) {
      val got = ops.TimeSeries.intervalOverlapPairs(a, b, w)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == naive, s"w=$w: ${got.size} vs ${naive.size} pairs")
      // the fan-out law on the heavy tail: explode rows == Σ(bins per
      // interval), with the operator's own floor-division binning
      def law(df: org.apache.spark.sql.DataFrame, s: String, e: String): Long =
        df.agg(sum(expr(ops.TimeSeries.binFdiv(e, w)) -
          expr(ops.TimeSeries.binFdiv(s, w)) + lit(1L))).head.getLong(0)
      def exploded(df: org.apache.spark.sql.DataFrame, s: String, e: String): Long =
        df.withColumn("bin", explode(sequence(
          expr(ops.TimeSeries.binFdiv(s, w)), expr(ops.TimeSeries.binFdiv(e, w))))).count()
      assert(exploded(a, "s_a", "e_a") == law(a, "s_a", "e_a"), s"w=$w side a")
      assert(exploded(b, "s_b", "e_b") == law(b, "s_b", "e_b"), s"w=$w side b")
    }
  }

  test("intervalOverlapPairsSalted is pair-set-identical to the unsalted form on the storm shape") {
    import spark.implicits._
    // the same adversarial corpus: heavy-tailed lengths, 15% of probe
    // starts collapsed into bin 0 — the configuration whose hot-bin
    // candidate product IntervalSkewStress measured growing 12× across
    // the width sweep. Salting must change ROUTING only.
    val binUs = 1000L
    val a = IntervalSkewStress.intervals(spark, 3000L, binUs, 50, "a", 0.0, 11)
    val b = IntervalSkewStress.intervals(spark, 300L, binUs, 50, "b", 0.15, 77)
    val want = ops.TimeSeries.intervalOverlapPairs(a, b, binUs)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(want.size > 1000, s"storm corpus too sparse (${want.size} pairs)")
    // non-vacuity: at threshold 500 the storm bin (and only bins like
    // it) must actually be hot, so the salted path is genuinely
    // exercised — an empty hot set would make this test prove nothing
    def census(w: Long, hp: Long): Long = {
      def ex(df: org.apache.spark.sql.DataFrame, s: String, e: String) =
        df.withColumn("bin", explode(sequence(
          expr(ops.TimeSeries.binFdiv(s, w)), expr(ops.TimeSeries.binFdiv(e, w)))))
      ex(a, "s_a", "e_a").groupBy(col("bin")).agg(count(lit(1)).as("ca"))
        .join(ex(b, "s_b", "e_b").groupBy(col("bin")).agg(count(lit(1)).as("cb")), "bin")
        .filter(col("ca") * col("cb") > hp).count()
    }
    val nHot = census(binUs, 500L)
    assert(nHot >= 1, "threshold 500 must make at least the storm bin hot")
    val nAll = census(binUs, -1L)
    assert(nHot < nAll, "threshold 500 must also leave some bins cold (mixed-path coverage)")
    for ((hp, label) <- Seq(500L -> "mixed hot/cold", -1L -> "all bins hot",
        Long.MaxValue -> "no bin hot")) {
      val got = ops.TimeSeries.intervalOverlapPairsSalted(a, b, binUs,
          salt = 8, hotProduct = hp)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"$label (hotProduct=$hp): ${got.size} vs ${want.size} pairs")
      assert(got.distinct == got, s"$label produced duplicate pairs")
    }
  }
}
