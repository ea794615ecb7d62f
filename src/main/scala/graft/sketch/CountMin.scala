package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-min sketch as a DATAFRAME of (d, c, cnt) cells — the third
  * member of the mergeable-sketch family (HLL distinct rollup q91,
  * Bloom membership q94): fixed-size frequency summaries that compose
  * by simple aggregation, so per-partition/per-day sketches roll up
  * without ever re-touching raw data.
  *
  * Representation: depth `d` independent hash rows × width `w` counters.
  * Build is one exploded projection (d cells per item, xxhash64 seeded
  * by row index) + ONE aggregation bounded by d·w cells regardless of
  * input size; merge is union + groupBy + sum (cell-wise addition —
  * CMS(A ⊎ B) = CMS(A) + CMS(B), exactly); estimate(key) = min over the
  * d cells the key hashes to, which can only OVER-estimate (collisions
  * add, never subtract): est ≥ true always, and est ≤ true + e/w·N with
  * probability 1 - e^-d (Cormode & Muthukrishnan 2005). SketchSpec pins
  * the one-sided guarantee, the error band, and lossless merge.
  *
  * Scale shape: the sketch is d·w rows (~256 Ki cells at defaults) —
  * broadcast it to probe candidate sets; raw streams never shuffle more
  * than the d·w cell table. This is how frequency questions ("is this
  * n-gram boilerplate?") get answered over 100 TB without carrying the
  * full distinct-key table through a shuffle — the exact twin (q96)
  * stays the oracle-verified reference. */
object CountMin {

  /** ~256 Ki counters: w sized so e/w · N stays ≪ the frequencies that
    * matter at tested scale (N ≈ 10^5 shingle occurrences at sf0.01 →
    * additive error ~4); size w ∝ N/ε for a target ε at production. */
  val DefaultW = 65536
  val DefaultD = 4

  /** Row hash: md5 of "rowIndex|key" (r9; was xxhash64) — 60 md5 bits
    * mod w. Replayable cross-engine, which is what lets the q99 oracle
    * rebuild the identical cell table and estimates; the CMS guarantees
    * only need the d rows to be independent-ish hashes, which seeded
    * md5 prefixes are. With `spark.graft.replayableHashes=false`
    * (graft.HashFamilies) the same cell map runs on codegen'd seeded
    * xxhash64 — production speed, no oracle replay. The flag must match
    * between build and estimate (both read the session conf, so it
    * does within one session). */
  private def cell(key: Column, d: Column, w: Int, replayable: Boolean): Column =
    if (replayable)
      pmod(conv(substring(md5(concat(d.cast("string"), lit("|"), key.cast("string"))), 1, 15), 16, 10)
        .cast("long"), lit(w))
    else pmod(xxhash64(d, key), lit(w))

  /** Sketch a one-column item stream (multiset — duplicates COUNT). */
  def build(items: DataFrame, w: Int = DefaultW, d: Int = DefaultD): DataFrame = {
    val key = col(items.columns.head)
    val rep = graft.HashFamilies.replayable(items.sparkSession)
    items.withColumn("_d", explode(sequence(lit(0), lit(d - 1))))
      .select(col("_d").as("d"), cell(key, col("_d"), w, rep).as("c"))
      .groupBy(col("d"), col("c")).agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise addition — the mergeable-summary contract. */
  def merge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ union _)
      .groupBy(col("d"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a candidate set: min over the d probed cells;
    * an absent cell means nothing ever hashed there → 0. */
  def estimate(cands: DataFrame, keyCol: String, sketch: DataFrame,
      w: Int = DefaultW, d: Int = DefaultD): DataFrame = {
    val cols = cands.columns.map(col).toSeq
    val rep = graft.HashFamilies.replayable(cands.sparkSession)
    cands.withColumn("_d", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("_c", cell(col(keyCol), col("_d"), w, rep))
      .join(broadcast(sketch), col("_d") === sketch("d") && col("_c") === sketch("c"), "left")
      .groupBy(cols: _*)
      .agg(min(coalesce(sketch("cnt"), lit(0L))).as("est"))
  }

  /** q99: CMS frequency estimates for the exact heavy-hitter shingles
    * (q96's top-50) — the production probe pattern: the sketch
    * summarizes the full shingle stream in d·w cells, candidates get
    * their frequency WITHOUT a second pass over raw text. Hash-checked
    * since r9 (md5 cells replay in the oracle — build, merge-free
    * probe, min-over-rows estimates all bit-equal); SketchSpec
    * additionally pins est ≥ exact df (one-sided) with a tight
    * additive band against oracle-green q96. */
  def q99CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // one cached materialization feeds both the sketch build and the
    // candidate mining (q96's agg) — the corpus is tokenized once
    val stream = graft.Caches.register(
      graft.dedup.Dedup.explodedShingles(spark, dir).cache())
    val sketch = build(stream)
    val cands = stream
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("s")).limit(50)
      .select(col("s"))
    estimate(cands, "s", sketch)
      .orderBy(col("est").desc, col("s"))
  }

  /** Full replay of the q99 chain: the same shingle stream CTEs as the
    * q96 oracle, the d x w cell build from the md5 row hashes, and the
    * min-over-probed-cells estimate for the exact top-50. */
  val q99Sql: String = {
    val cell = s"CAST('0x' || substr(md5(CAST(t.d AS VARCHAR) || '|' || s), 1, 15) AS BIGINT) % $DefaultW"
    s"WITH ${graft.dedup.Dedup.shingleCtes}, " +
      s"ck AS (SELECT t.d AS d, $cell AS c FROM e0, range(0, $DefaultD) t(d)), " +
      "cells AS (SELECT d, c, count(*) AS cnt FROM ck GROUP BY 1, 2), " +
      "cands AS (SELECT s FROM e0 GROUP BY s ORDER BY count(*) DESC, s LIMIT 50), " +
      s"probe AS (SELECT cands.s, t.d AS d, $cell AS c FROM cands, range(0, $DefaultD) t(d)) " +
      "SELECT probe.s, min(coalesce(cells.cnt, 0)) AS est " +
      "FROM probe LEFT JOIN cells ON probe.d = cells.d AND probe.c = cells.c " +
      "GROUP BY probe.s ORDER BY est DESC, probe.s"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_cms_heavy_hitters" -> q99CmsHeavyHitters _)

  val oracle: Map[String, String] = Map(
    "q99_cms_heavy_hitters" -> q99Sql)
}
