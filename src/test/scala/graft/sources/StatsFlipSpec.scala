package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** COLUMN STATISTICS for broadcast decisions (r17, verdict item 4):
  * per-column NDV sketches + null counts in the stats sidecar
  * ([[JsonDocNdv]]), surfaced through `SupportsReportStatistics
  * .columnStats`. The headline pin is the FLIP: a join whose sides are
  * both too big to broadcast by raw size becomes a BroadcastHashJoin
  * under CBO because the selective equality filter's output shrinks by
  * 1/ndv — the filtered BIG table wins the broadcast side, with ZERO
  * answer changes. Also pins the sketch math (accuracy, merge law,
  * null counts, roundtrip) and union's all-or-nothing conservatism. */
class StatsFlipSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    // STATIC planner decisions only: AQE would re-plan by runtime sizes
    // and mask the statistics under test
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("stats-flip-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("ndv sketch: accuracy within 10%, register-max merge law, roundtrip") {
    val a = JsonDocNdv.empty
    (0L until 1000L).foreach(v => JsonDocNdv.add(a, JsonDocNdv.hashValue(v)))
    val est = JsonDocNdv.estimate(a)
    assert(math.abs(est - 1000L) <= 100, s"1000 distinct estimated as $est")
    // merge(a half, b half) == build(all): register-max is exact union
    val h1 = JsonDocNdv.empty; val h2 = JsonDocNdv.empty
    (0L until 500L).foreach(v => JsonDocNdv.add(h1, JsonDocNdv.hashValue(v)))
    (500L until 1000L).foreach(v => JsonDocNdv.add(h2, JsonDocNdv.hashValue(v)))
    assert(JsonDocNdv.estimate(JsonDocNdv.merge(h1, h2)) === est,
      "merge must reproduce the single-pass sketch exactly")
    // duplicate values never move the estimate
    (0L until 500L).foreach(v => JsonDocNdv.add(a, JsonDocNdv.hashValue(v)))
    assert(JsonDocNdv.estimate(a) === est)
    // roundtrip
    assert(JsonDocNdv.fromB64(JsonDocNdv.toB64(a)).get.toSeq === a.toSeq)
    // tiny cardinalities are near-exact (linear counting regime)
    val t = JsonDocNdv.empty
    Seq("x", "y", "z").foreach(s => JsonDocNdv.add(t, JsonDocNdv.hashValue(s)))
    assert(JsonDocNdv.estimate(t) === 3L)
  }

  test("the sidecar carries ndv + nulls; union merges them, drops on partial coverage") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ndv").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, g BIGINT, s STRING) USING `graft-jsondoc`")
    (0 until 4).foreach { i =>
      (i * 250 until (i + 1) * 250).map(j =>
        (j.toLong, (j % 50).toLong, if (j % 10 == 0) null else s"v$j"))
        .toDF("k", "g", "s").coalesce(1).writeTo(tbl).append()
    }
    val stats = JsonDocStats.load(s"$root/t")
    assert(stats.size === 4)
    stats.values.foreach { fs =>
      assert(fs.ndv.keySet === Set("k", "g", "s"))
      assert(fs.nulls("s") === 25L && fs.nulls("k") === 0L)
    }
    val merged = JsonDocStats.union(stats.values.toSeq.map(Some(_))).get
    assert(math.abs(JsonDocNdv.estimate(merged.ndv("k")) - 1000L) <= 100)
    assert(math.abs(JsonDocNdv.estimate(merged.ndv("g")) - 50L) <= 5)
    assert(merged.nulls("s") === 100L)
    // an entry WITHOUT a sketch (legacy) drops the merged sketch for
    // that column — never a lying partial merge
    val legacy = JsonDocStats.FileStats(10L, Map.empty)
    val partial = JsonDocStats.union(Seq(Some(legacy)) ++ stats.values.map(Some(_))).get
    assert(partial.ndv.isEmpty && partial.nulls.isEmpty)
  }

  test("the broadcast FLIP: a selective filter's ndv estimate wins the broadcast side") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_flip").toString
    val big = s"graftcat.`$root/big`"
    val small = s"graftcat.`$root/small`"
    spark.sql(s"CREATE TABLE $big (k BIGINT, g BIGINT, pad STRING) USING `graft-jsondoc`")
    spark.sql(s"CREATE TABLE $small (k BIGINT, tag STRING) USING `graft-jsondoc`")
    (0 until 40000).map(j => (j.toLong, (j % 200).toLong, "p" * 48))
      .toDF("k", "g", "pad").repartition(8).writeTo(big).append()
    (0 until 4000).map(j => (j.toLong, s"t$j")).toDF("k", "tag")
      .repartition(2).writeTo(small).append()
    def bytesOf(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".jsonl")).map(_.length()).sum
    // threshold below BOTH raw sizes: nothing broadcasts on size alone
    val threshold = math.min(bytesOf(s"$root/big"), bytesOf(s"$root/small")) / 2
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    def join(where: String) = spark.sql(
      s"SELECT b.k, b.g, s.tag FROM $big b JOIN $small s ON b.k = s.k $where")
    try {
      // UNFILTERED: both sides over threshold -> sort-merge join. This
      // is the control proving the threshold binds.
      val unfiltered = join("").queryExecution.executedPlan.toString
      assert(!unfiltered.contains("BroadcastHashJoin") &&
        unfiltered.contains("SortMergeJoin"),
        s"both sides over threshold must sort-merge:\n$unfiltered")
      // FILTERED: g = 7 is fully pushed (no Filter node survives), so
      // the SCAN's own statistics must shrink by 1/ndv(g) = 1/200 —
      // ~200 rows, far under threshold -> the filtered BIG side
      // broadcasts. No CBO needed: the size-based planner reads the
      // scan estimate directly.
      val filtered = join("WHERE b.g = 7").queryExecution.executedPlan.toString
      assert(filtered.contains("BroadcastHashJoin"),
        s"the ndv-shrunk scan estimate must flip the join to a broadcast:\n$filtered")
      // zero answer changes: same rows as the no-broadcast plan
      val flipped = join("WHERE b.g = 7").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val smj = join("WHERE b.g = 7").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
      assert(flipped === smj, "the flip must not change one answer")
      // g = 7 keeps k ≡ 7 (mod 200); the small side holds k < 4000
      assert(flipped.length === 20, s"got ${flipped.length}")
      // the unfiltered scan still reports EXACT rows (selectivity only
      // engages under pushed filters — the r14 exact-numRows contract)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      val stats = spark.table(big).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(40000)), stats.toString)
      // the other priced shapes land sane estimates on the pushed scan
      def est(where: String): Long =
        spark.table(big).where(where).queryExecution.optimizedPlan.stats
          .rowCount.map(_.toLong).getOrElse(-1L)
      val eq = est("g = 7") // 1/ndv: ~200 of 40000 (HLL ±10%)
      assert(eq >= 150 && eq <= 260, s"equality estimate drifted: $eq")
      val in3 = est("g IN (3, 5, 9)") // 3/ndv: ~600
      assert(in3 >= 450 && in3 <= 780, s"In estimate drifted: $in3")
      val range = est("g >= 150") // (199-150)/199 of 40000 ≈ 9850
      assert(range >= 8000 && range <= 12000, s"range estimate drifted: $range")
      val nn = est("pad IS NOT NULL") // no nulls: stays ~exact
      assert(nn === 40000, s"IS NOT NULL over a null-free column: $nn")
      val conj = est("g = 7 AND k >= 20000") // product: ~100
      assert(conj >= 60 && conj <= 160, s"conjunction estimate drifted: $conj")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
