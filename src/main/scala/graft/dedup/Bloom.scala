package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.text.TextAnalysis

/** Shared persistent-store plumbing for the incremental ingests
  * (Bloom.ingestBatch / Dedup.lshIngestBatch). All path probes go
  * through the Hadoop FileSystem of the PATH (not java.io.File, which
  * silently answers false for hdfs:///s3a:// URIs and would make a
  * remote-store ingest treat its whole history as empty). */
private[dedup] object IngestStores {
  def fs(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  def readOr(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(spark, path)) spark.read.parquet(path)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** At-least-once replay protocol for one ingest step. foreachBatch can
    * replay a batchId at ANY point, so each step is three idempotent
    * stages gated by on-disk markers — both PROTOCOL-OWNED (never the
    * committer's `_SUCCESS`, which object-store deployments commonly
    * disable via marksuccessfuljobs=false; gating on it there would
    * recompute a landed batch against post-update stores and wipe it):
    *   1. land the novel rows, then write `_GRAFT_LANDED` (a crash
    *      between the two recomputes from the still-untouched stores —
    *      same result; once landed, the recompute is SKIPPED because
    *      the stores may already be partially updated);
    *   2. (re-)apply the store updates FROM the landed rows — appends
    *      may duplicate store rows across a retry, which both ingests
    *      tolerate (anti-join / bit_or / distinct semantics);
    *   3. write `_GRAFT_COMMITTED`; its presence short-circuits the
    *      whole step on any later replay.
    * `compute` must be a pure function of the PRE-batch store state;
    * `applyStores` reads only the landed batch partition. */
  def replayedStep(spark: SparkSession, batchOut: String)
      (compute: => DataFrame)(applyStores: DataFrame => Unit): Unit = {
    val filesystem = fs(spark, batchOut)
    def marker(name: String) = new org.apache.hadoop.fs.Path(s"$batchOut/$name")
    if (filesystem.exists(marker("_GRAFT_COMMITTED"))) return
    if (!filesystem.exists(marker("_GRAFT_LANDED"))) {
      compute.write.mode("overwrite").parquet(batchOut)
      filesystem.create(marker("_GRAFT_LANDED"), true).close()
    }
    applyStores(spark.read.parquet(batchOut))
    filesystem.create(marker("_GRAFT_COMMITTED"), true).close()
  }
}

/** Bloom-filter membership as a DATAFRAME of 64-bit blocks — the
  * incremental-dedup primitive for an appending corpus (reference scope:
  * its ETL re-fetches and re-submits the world every run, task.ts:85-190;
  * a 100 TB corpus can't — new batches must be deduped against billions
  * of already-ingested fingerprints without re-shuffling the corpus).
  *
  * Representation: (block BIGINT, bits BIGINT) — block i holds bits
  * [64i, 64i+64) of an m-bit Bloom filter. Building is one exploded
  * projection (k probe positions per key, all map-side arithmetic:
  * xxhash64 seeded by probe index) and ONE aggregation shuffling at most
  * min(k·|keys|, m/64) tiny rows. Nothing ever lands on the driver, the
  * table is trivially persistable, and merging two filters is
  * `union + groupBy(block) + bit_or` — associative and commutative, so
  * per-batch blooms roll up incrementally (BloomSpec pins build-once ≡
  * merge-of-parts; streaming twin in streaming/Streaming.scala).
  *
  * Scale regimes: at the default m = 2^20 bits the block table is
  * ≤ 16 Ki rows (128 KiB) — broadcast it to probe. Sized for billions of
  * keys (m ≈ 10 bits/key ⇒ ~1.2 GiB for 10^9 keys) the same probe is a
  * shuffled join on `block` instead of a broadcast: probes are
  * k rows/key, blocks are m/64 rows, both sides hash-partition evenly by
  * construction (positions are uniform hashes), so there is no skew path.
  * Size m from `approx_count_distinct` of the key column; k ≈ 0.7·m/n.
  */
object Bloom {

  /** Default filter geometry: m must be a multiple of 64 (whole blocks).
    * 2^20 bits / k=5 holds ~10^5 keys under ~3% false-positive rate —
    * comfortable for every tested scale factor; production sizes via the
    * formulas above. */
  val DefaultBits: Long = 1L << 20
  val DefaultK: Int = 5

  /** k probe positions for `key`: pmod(xxhash64(seed_i, key), m). The
    * probe index rides as the xxhash64 seed column, so the k hash
    * functions are independent without any driver-side state. */
  private def probes(keyed: DataFrame, key: Column, mBits: Long, k: Int): DataFrame =
    keyed.withColumn("_i", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("_pos", pmod(xxhash64(col("_i"), key), lit(mBits)))
      .withColumn("block", (col("_pos") / 64).cast("long"))
      .withColumn("mask", expr("shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"))

  /** Build the block table from a one-column key DataFrame. bit_or is
    * idempotent, so duplicate keys cost nothing and no distinct() is
    * needed upstream. */
  def buildBlocks(keys: DataFrame, mBits: Long = DefaultBits, k: Int = DefaultK): DataFrame = {
    require(mBits % 64 == 0, s"mBits=$mBits must be a multiple of 64")
    probes(keys, keys.columns.headOption.map(col)
        .getOrElse(throw new IllegalArgumentException("keys needs one column")),
        mBits, k)
      .groupBy(col("block")).agg(bit_or(col("mask")).as("bits"))
  }

  /** Merge block tables (filters built with the SAME m and k): the
    * incremental path — yesterday's bloom ∪ today's batch bloom. */
  def mergeBlocks(filters: DataFrame*): DataFrame =
    filters.reduce(_ union _).groupBy(col("block")).agg(bit_or(col("bits")).as("bits"))

  /** Probe: annotate each row of `batch` with `bloom_hit` — true iff ALL
    * k probe bits are set (classic Bloom semantics: false ⇒ definitely
    * novel; true ⇒ maybe seen, confirm exactly). One exploded projection,
    * a broadcast join against the block table, and a groupBy back to one
    * row per input row. Absent blocks (never written) read as bits=0.
    * Contract: the groupBy is over the batch's full column set, so rows
    * that are COMPLETE duplicates collapse to one output row — give rows
    * an id column if that distinction matters (every caller here keys by
    * doc_id). */
  def probe(batch: DataFrame, keyCol: String, blocks: DataFrame,
      mBits: Long = DefaultBits, k: Int = DefaultK): DataFrame = {
    val cols = batch.columns.map(col).toSeq
    // broadcast only while the block table is broadcast-SIZED: 2^24
    // bits = 2^18 (block, bits) rows ≈ 4 MiB raw — comfortably inside
    // Spark's 10 MB broadcast default. Above that, fall back to a plain
    // join — Catalyst shuffles both sides on `block`, the billion-key
    // regime described in the module doc. The cutover is
    // geometry-derived (rows = mBits/64, ~16 B/row), not guessed from
    // runtime stats, so the plan is deterministic.
    val blockSide = if (mBits <= (1L << 24)) broadcast(blocks) else blocks
    probes(batch, col(keyCol), mBits, k)
      .join(blockSide, Seq("block"), "left")
      .withColumn("_hit", coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0)
      .groupBy(cols: _*)
      .agg(min(col("_hit")).as("bloom_hit"))
  }

  /** q94: Bloom-prefiltered incremental exact dedup. Scenario: 80% of
    * documents (doc_id % 5 != 4) are the already-ingested corpus, 20%
    * (doc_id % 5 == 4) arrive as a new batch; emit the batch docs whose
    * canonical fingerprint (q28) is NOT already in the corpus — the rows
    * an ingest job would append.
    *
    * EXACT output, Bloom-shaped plan: bloom-negative rows are novel by
    * the no-false-negative guarantee and never touch a join; only the
    * bloom-POSITIVE sliver (true dups + the small false-positive rate)
    * is confirmed with an anti-join against the corpus fingerprints. At
    * 100 TB that anti-join's left side shrinks from |batch| to
    * ~|dups| + fpp·|batch| — the filter does the work, the join only
    * adjudicates maybes — while the output stays bit-identical to the
    * plain anti-join (which is exactly what the DuckDB oracle runs).
    * BloomSpec additionally pins: q94 ≡ plain anti-join, zero false
    * negatives, the false-positive rate at geometry, and build-vs-merge
    * equality. */
  def q94BloomDedup(spark: SparkSession, dir: String): DataFrame = {
    // cached: the fingerprint projection feeds three subplans (corpus
    // blocks, batch probe, confirm anti-join) and probed feeds both
    // novel branches — without the caches each branch re-runs the md5
    // scan and the whole probe pipeline. Registered for harness-side
    // unpersist (graft.Caches).
    val docs = graft.Caches.register(documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.fingerprintColumn.as("fp")).cache())
    val corpus = docs.where(pmod(col("doc_id"), lit(5)) =!= 4)
    val batch = docs.where(pmod(col("doc_id"), lit(5)) === 4)
    val blocks = buildBlocks(corpus.select(col("fp")))
    val probed = graft.Caches.register(probe(batch, "fp", blocks).cache())
    val novelFast = probed.where(!col("bloom_hit")).select(col("doc_id"), col("fp"))
    val confirmed = probed.where(col("bloom_hit")).select(col("doc_id"), col("fp"))
      .join(corpus.select(col("fp")), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
    novelFast.union(confirmed).orderBy(col("doc_id"))
  }

  private val fpSql =
    "substr(md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))),1,16)"

  /** Oracle = the plain anti-join q94 is provably equivalent to (fp is
    * never NULL, so NOT IN is safe three-valued-logic-wise). */
  val q94Sql: String =
    s"WITH d AS (SELECT doc_id, $fpSql AS fp FROM documents) " +
      "SELECT doc_id, fp FROM d WHERE doc_id % 5 = 4 " +
      "AND fp NOT IN (SELECT fp FROM d WHERE doc_id % 5 <> 4) ORDER BY doc_id"

  /** One incremental-ingest step against a persistent dedup memory:
    * `blocksPath` (the corpus Bloom block table) and `fpStorePath` (the
    * exact fingerprint store) accumulate across calls; each call dedups
    * `batch` (doc_id, text, ...) within itself and against everything
    * ever ingested, lands the truly-novel rows under
    * `novelPath/batch=<batchId>`, and appends their fingerprints to both
    * stores. Output is EXACT (bloom positives are confirmed against the
    * fp store — no false drops, no false keeps); the bloom's job is that
    * the confirm anti-join's probe side is |dups| + fpp·|batch| instead
    * of |batch|.
    *
    * Write ordering is load-bearing: the novel rows are written to their
    * batch=<id> output partition FIRST (computed purely from the OLD
    * store state) and read back for the store updates. Updating the
    * stores before consuming the novel plan would be wrong even with a
    * cache: Spark's overwrite invalidates caches by path
    * (`recacheByPath`), silently recomputing "novel" against the
    * already-updated stores — where every novel row now looks like a
    * duplicate of itself. (BloomSpec's 3-batch parity case fails loudly
    * under that ordering.) Replays are safe: the whole step runs under
    * `IngestStores.replayedStep` (land → re-apply stores → commit
    * marker), so foreachBatch's at-least-once delivery can re-run any
    * stage without losing landed rows or corrupting the stores.
    *
    * This is the streaming meeting point of the dedup chain
    * (streaming/Streaming.scala wraps it in foreachBatch; StreamingSpec
    * pins multi-run parity): unlike watermark-bounded
    * `dropDuplicatesWithinWatermark` state, the bloom remembers the
    * WHOLE corpus at ~10 bits/document forever. On a production cluster
    * the two stores live in a transactional table format (or versioned
    * paths) rather than plain overwrite-in-place. */
  def ingestBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      blocksPath: String, fpStorePath: String, novelPath: String,
      mBits: Long = DefaultBits, k: Int = DefaultK): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val batchOut = s"$novelPath/batch=$batchId"
    val blocksSchema =
      StructType(Seq(StructField("block", LongType), StructField("bits", LongType)))
    val fpSchema = StructType(Seq(StructField("fp", StringType)))
    // SELF-HEALING block read: the block table is an overwritten
    // DERIVED structure (plain parquet overwrite is not atomic — a
    // crash mid-write leaves a missing or partial directory, and a
    // replay that trusted it would permanently drop historical bits →
    // silent bloom false negatives → duplicate rows published). The
    // append-only fp store is ground truth, so blocks are only trusted
    // when their write committed (_SUCCESS present) and are otherwise
    // rebuilt from the fp store in one pass. Deployments that disable
    // success markers rebuild every batch — correct, just slower.
    def readBlocks(): DataFrame =
      if (IngestStores.exists(spark, s"$blocksPath/_SUCCESS"))
        spark.read.parquet(blocksPath)
      else if (IngestStores.exists(spark, fpStorePath))
        buildBlocks(spark.read.parquet(fpStorePath), mBits, k)
      else IngestStores.readOr(spark, blocksPath, blocksSchema)
    val blocks = readBlocks()
    val fpStore = IngestStores.readOr(spark, fpStorePath, fpSchema)
    // within-batch first-arrival dedup, then the bloom/confirm split;
    // probed is cached because both novel branches read it (plans are
    // lazy — nothing materializes on the replay-skip path)
    val keyed = batch.withColumn("fp", TextAnalysis.fingerprintColumn)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id"))
    val firstPerFp = keyed.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
    val probed = probe(firstPerFp, "fp", blocks, mBits, k).cache()
    try {
      IngestStores.replayedStep(spark, batchOut) {
        // unionByName: the USING-column join reorders fp to the front,
        // and a positional union would silently cross-cast columns.
        // batch=<id> is partition-discovery-compatible, so reading
        // novelPath yields the full deduped corpus with a batch column.
        probed.where(!col("bloom_hit")).drop("bloom_hit")
          .unionByName(probed.where(col("bloom_hit")).drop("bloom_hit")
            .join(fpStore, Seq("fp"), "left_anti"))
      } { landed =>
        val landedFps = landed.select(col("fp"))
        landedFps.write.mode("append").parquet(fpStorePath)
        val newBlocks = mergeBlocks(readBlocks(),
          buildBlocks(landedFps, mBits, k)).cache()
        newBlocks.count() // cut the read dependency on the files being replaced
        newBlocks.write.mode("overwrite").parquet(blocksPath)
        newBlocks.unpersist()
      }
    } finally probed.unpersist()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_bloom_dedup" -> q94BloomDedup _)

  val oracle: Map[String, String] = Map(
    "q94_bloom_dedup" -> q94Sql)
}
