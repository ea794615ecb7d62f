package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom block-table primitive (dedup/Bloom.scala): classic filter
  * guarantees (zero false negatives, bounded false positives at
  * geometry), the mergeability that makes it incremental, and q94's
  * equivalence to the plain anti-join it accelerates. */
class BloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  import dedup.Bloom

  test("zero false negatives: every inserted key probes as a hit") {
    import spark.implicits._
    val keys = (1L to 2000L).map(i => s"key-$i").toDF("k")
    val blocks = Bloom.buildBlocks(keys)
    val probed = Bloom.probe(keys, "k", blocks)
    assert(probed.where(!col("bloom_hit")).count() == 0L)
  }

  test("false-positive rate is small at the default geometry") {
    import spark.implicits._
    val inserted = (1L to 2000L).map(i => s"key-$i").toDF("k")
    val absent = (1L to 2000L).map(i => s"other-$i").toDF("k")
    val blocks = Bloom.buildBlocks(inserted)
    val fp = Bloom.probe(absent, "k", blocks).where(col("bloom_hit")).count()
    // m=2^20, k=5, n=2000 → theoretical fpp ~ (1-e^{-kn/m})^k ≈ 1e-10;
    // allow a wide margin — the assertion is "prefilter, not coin flip"
    assert(fp <= 20L, s"false positives: $fp of 2000")
  }

  test("block table never exceeds m/64 rows and build is duplicate-insensitive") {
    import spark.implicits._
    val keys = (1L to 500L).map(i => s"key-${i % 100}").toDF("k") // heavy dups
    val blocks = Bloom.buildBlocks(keys).cache()
    try {
      assert(blocks.count() <= Bloom.DefaultBits / 64)
      val once = Bloom.buildBlocks((0L until 100L).map(i => s"key-$i").toDF("k"))
      // bit_or idempotence: inserting each key 5× sets exactly the bits
      // inserting it once sets
      assert(blocks.except(once).isEmpty && once.except(blocks).isEmpty)
    } finally blocks.unpersist()
  }

  test("merge of per-batch blooms equals the bloom of the union (incremental contract)") {
    import spark.implicits._
    val a = (1L to 700L).map(i => s"key-$i").toDF("k")
    val b = (500L to 1200L).map(i => s"key-$i").toDF("k")
    val merged = Bloom.mergeBlocks(Bloom.buildBlocks(a), Bloom.buildBlocks(b))
    val direct = Bloom.buildBlocks(a.union(b))
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }

  test("q94 is bit-identical to the plain anti-join it accelerates") {
    val q94 = Bloom.q94BloomDedup(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), text.TextAnalysis.fingerprintColumn.as("fp"))
    val plain = docs.where(pmod(col("doc_id"), lit(5)) === 4)
      .join(docs.where(pmod(col("doc_id"), lit(5)) =!= 4).select(col("fp")),
        Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
    assert(q94.count() > 0)
    assert(q94.except(plain).isEmpty && plain.except(q94).isEmpty)
  }

  test("incremental ingest across 3 batches equals one-shot first-arrival dedup") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_ingest")
      .toFile.getAbsolutePath
    val blocks = s"$root/blocks"; val fps = s"$root/fps"; val out = s"$root/novel"
    // cross-batch dups (doc 11 dups 1, doc 21 dups 2), a within-batch dup
    // (22 dups 20), and canonical-form dups (case/punctuation only)
    val b1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
    val b2 = Seq((11L, "ALPHA beta: gamma!"), (12L, "zeta eta"))
    val b3 = Seq((20L, "theta iota"), (22L, "theta, iota"), (21L, "delta epsilon"))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      dedup.Bloom.ingestBatch(spark, b.toDF("doc_id", "text"), i, blocks, fps, out)
    }
    // one-shot expectation: first arrival per canonical fingerprint;
    // arrival order here == batch order then doc_id order within batch
    def novelIds(): Set[Long] = spark.read.parquet(out).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(novelIds() == Set(1L, 2L, 12L, 20L))
    // at-least-once replay of a COMMITTED batchId must be a no-op — in
    // particular it must NOT recompute novelty against the updated
    // stores and wipe the landed partition
    dedup.Bloom.ingestBatch(spark, b1.toDF("doc_id", "text"), 0, blocks, fps, out)
    assert(novelIds() == Set(1L, 2L, 12L, 20L))
    // the persistent stores agree: fp store holds one fp per novel doc,
    // blocks == a fresh bloom over exactly those fps
    val storedFps = spark.read.parquet(fps)
    assert(storedFps.count() == 4L && storedFps.distinct().count() == 4L)
    val rebuilt = dedup.Bloom.buildBlocks(storedFps)
    val persisted = spark.read.parquet(blocks)
    assert(persisted.except(rebuilt).isEmpty && rebuilt.except(persisted).isEmpty)
    // crash-window self-heal: a block-store overwrite that died mid-write
    // (simulated: data gone, no _SUCCESS) must NOT yield bloom false
    // negatives — the blocks are rebuilt from the append-only fp store,
    // so a dup of batch 1 in a later batch is still dropped
    new java.io.File(blocks).listFiles().foreach(_.delete())
    dedup.Bloom.ingestBatch(spark,
      Seq((30L, "alpha beta gamma"), (31L, "genuinely new text")).toDF("doc_id", "text"),
      3, blocks, fps, out)
    assert(novelIds() == Set(1L, 2L, 12L, 20L, 31L))
  }

  test("probe preserves every input row exactly once") {
    import spark.implicits._
    val keys = (1L to 300L).map(i => (i, s"key-${i % 40}")).toDF("id", "k")
    val blocks = Bloom.buildBlocks(keys.select(col("k")))
    val probed = Bloom.probe(keys, "k", blocks).cache()
    try {
      assert(probed.count() == 300L)
      assert(probed.select(col("id")).distinct().count() == 300L)
    } finally probed.unpersist()
  }
}
