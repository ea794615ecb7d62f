package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Training-data preparation operators: string-predicate scans, the
  * deterministic hash shuffle/split every corpus pipeline needs
  * (reproducible regardless of partitioning or cluster size — the
  * property `rand()` does NOT have on re-runs over re-partitioned data),
  * and seeded stratified sampling.
  */
object DataPrep {

  /** LIKE / prefix / suffix predicates. All three push into the parquet
    * scan as StringContains / StringStartsWith / StringEndsWith — at scan
    * scale, predicate class determines bytes read. */
  def q56LikePred(spark: SparkSession, dir: String): DataFrame =
    part(spark, dir)
      .filter(col("p_type").like("%ECO%") &&
        col("p_name").startsWith("b") &&
        !col("p_brand").endsWith("5"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
      .orderBy(col("p_partkey"))

  val q56Sql: String =
    "SELECT p_partkey, p_name, p_brand, p_type FROM part " +
      "WHERE p_type LIKE '%ECO%' AND p_name LIKE 'b%' AND p_brand NOT LIKE '%5' " +
      "ORDER BY p_partkey"

  /** Deterministic shuffle + train/val/test split by content hash:
    * md5(doc_id || salt) gives every row a stable pseudo-random rank, so
    * the split is identical on any cluster, any partitioning, any rerun —
    * and expressible in ANSI SQL, so the oracle checks the exact
    * assignment. Ranges: train < 'c' (~75%), val < 'e' (~12.5%), rest
    * test (md5 hex digits are uniform over 0-f). */
  def q57HashSplit(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|graft-split-1")))
    documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("split",
        when(substring(col("h"), 1, 1) < "c", "train")
          .when(substring(col("h"), 1, 1) < "e", "val")
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  val q57Sql: String =
    "SELECT doc_id, CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|graft-split-1'),1,1) < 'c' THEN 'train' " +
      "WHEN substr(md5(CAST(doc_id AS VARCHAR) || '|graft-split-1'),1,1) < 'e' THEN 'val' " +
      "ELSE 'test' END AS split FROM documents ORDER BY doc_id"

  /** Deterministic stratified sample: per-language fractions via
    * hash-derived-uniform thresholding (the q57/q103 content-hash idiom
    * restricted per stratum). Each doc's uniform u = first 8 md5 hex
    * digits / 2^32 — exact in double (integer < 2^32, power-of-two
    * scale) — kept iff u < its language's fraction. Unlike
    * `df.stat.sampleBy` (Bernoulli over the engine RNG stream, so
    * membership depends on partitioning and engine), membership here is
    * a pure function of doc_id: identical on any cluster, any
    * partitioning, any rerun, and on DuckDB — so the driver hash-checks
    * the exact sample, and a training pipeline gets rerun-stable data.
    * No tie risk: both engines compare bit-identical doubles. */
  def q58StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING) || '|graft-strat-1'), 1, 8), 16, 10) AS BIGINT)")
      .cast("double") / lit(4294967296.0)
    val frac = when(col("lang") === "en", 0.5)
      .when(col("lang") === "de", 0.25)
      .when(col("lang") === "fr", 0.25)
      .when(col("lang") === "es", 0.25)
      .otherwise(0.1)
    documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .where(u < frac)
      .orderBy(col("doc_id"))
  }

  val q58Sql: String =
    "SELECT doc_id, lang FROM documents " +
      "WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|graft-strat-1'), 1, 8) AS BIGINT) / 4294967296.0 " +
      "< CASE WHEN lang = 'en' THEN 0.5 WHEN lang IN ('de','fr','es') THEN 0.25 ELSE 0.1 END " +
      "ORDER BY doc_id"

  /** Weighted mixture sampling: each language (stand-in for a source
    * domain) keeps a different deterministic fraction of its documents —
    * how a training mix applies per-domain sampling rates. Same
    * content-hash idiom as q57 (md5 hex prefix vs a per-domain cutoff),
    * so membership is cluster- and partitioning-invariant, reproducible
    * on both engines, and shuffle-free up to the oracle sort: en keeps
    * ~90% ('e6'/256), de ~50%, fr ~25%, everything else ~12.5%. */
  def q70Mixture(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|graft-mix-1")))
    val cutoff = when(col("lang") === "en", "e6")
      .when(col("lang") === "de", "80")
      .when(col("lang") === "fr", "40")
      .otherwise("20")
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), h.as("h"))
      .where(substring(col("h"), 1, 2) < cutoff)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  val q70Sql: String =
    "SELECT doc_id, lang FROM documents " +
      "WHERE substr(md5(CAST(doc_id AS VARCHAR) || '|graft-mix-1'), 1, 2) < " +
      "CASE lang WHEN 'en' THEN 'e6' WHEN 'de' THEN '80' WHEN 'fr' THEN '40' ELSE '20' END " +
      "ORDER BY doc_id"

  /** Data-profiling gate: per-column row/null/distinct counts and
    * min/max — the standard pre-ingest quality check. ONE scan computes
    * every column's stats simultaneously (the profile row set is then
    * just projections of that single aggregate), where the naive
    * per-column form — which the DuckDB oracle uses — scans once per
    * column; at 100 TB the single-pass shape is the difference between
    * one pass and C passes. min/max ride as strings so heterogeneous
    * column types stack into one result shape. The exact countDistinct
    * here is what makes the result oracle-checkable; the 100 TB profile
    * swaps it for approx_count_distinct (HLL, q10b pattern), turning the
    * multi-distinct Expand into plain partial aggregation. */
  def q72Profile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
    val df = orders(spark, dir)
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    // min/max ride as text so heterogeneous column types stack — but a
    // raw double→string cast renders >= 1e7 as "1.0E7" in Spark and
    // "10000000.0" in DuckDB. Floating columns go through DECIMAL(38,6)
    // (both engines round the exact binary value half-away-from-zero and
    // print plain notation at any magnitude); exact zero is special-cased
    // because BigDecimal(0, scale 6) prints "0E-6". |v| >= 1e32 exceeds
    // DECIMAL(38,6), where Spark's non-ANSI cast yields NULL while DuckDB
    // errors — guarded with raise_error so an out-of-range profile FAILS
    // LOUDLY on both engines instead of silently reporting a NULL
    // min/max; profiling columns of that magnitude needs a
    // format_number-style rendering instead.
    def asText(c: org.apache.spark.sql.Column, name: String): org.apache.spark.sql.Column =
      types(name) match {
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
          when(c === 0.0, lit("0.000000"))
            .when(abs(c) >= 1e32, raise_error(concat(
              lit(s"q72Profile: |$name| >= 1e32 exceeds DECIMAL(38,6) text rendering: "),
              c.cast("string"))))
            .otherwise(c.cast(org.apache.spark.sql.types.DecimalType(38, 6)).cast("string"))
        case _ => c.cast("string")
      }
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"dist_$c"),
      asText(min(col(c)), c).as(s"min_$c"),
      asText(max(col(c)), c).as(s"max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    cols.map(c => one.select(
        lit(c).as("col"), col("n"),
        (col("n") - col(s"cnt_$c")).as("n_null"),
        col(s"dist_$c").as("n_distinct"),
        col(s"min_$c").as("min_v"), col(s"max_$c").as("max_v")))
      .reduce(_.unionByName(_))
      .orderBy(col("col"))
  }

  val q72Sql: String = Seq(("o_orderkey", false), ("o_orderstatus", false),
      ("o_totalprice", true)).map { case (c, isFloat) =>
    // floating min/max mirror the Spark side's DECIMAL(38,6) text form
    def txt(agg: String) =
      if (isFloat) s"CAST(CAST($agg($c) AS DECIMAL(38,6)) AS VARCHAR)"
      else s"CAST($agg($c) AS VARCHAR)"
    s"SELECT '$c' AS col, count(*) AS n, CAST(count(*) - count($c) AS BIGINT) AS n_null, " +
      s"CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct, " +
      s"${txt("min")} AS min_v, ${txt("max")} AS max_v FROM orders"
  }.mkString("", " UNION ALL ", " ORDER BY col")

  /** Tokens per packed context window (q81/q82). */
  private val Ctx = 128L
  /** Documents per scan bucket for the distributed running sum (q81/q82). */
  private val ScanBucket = 1000L

  /** Sequence packing LAYOUT: concatenate the corpus token stream in
    * doc_id order and chop it into fixed 128-token context windows — the
    * standard pretraining batch layout (documents cross window
    * boundaries; a window holds segments of one or more documents).
    * Output: one row per (window_id, document) segment with the
    * segment's offset inside the document and its length, UNSORTED —
    * shared by q81 (which adds the oracle-determinism sort) and q82
    * (which joins the token payload back and re-shuffles by window).
    *
    * The global running token offset is the scale-critical piece: a
    * naive `sum OVER (ORDER BY doc_id)` forces every row through ONE
    * task (no partition key). This uses the standard two-level scan
    * instead: per-bucket running sums partitioned by doc_id range
    * (parallel), plus a bucket-offset cumsum over the tiny per-bucket
    * totals table (one row per `scanBucket` docs — the only serial step,
    * broadcast back). Bucketing by doc_id DIV scanBucket preserves the
    * global order because bucket boundaries align with id order; dense
    * ids give balanced buckets (skewed ids would only skew bucket SIZE,
    * never correctness). Window assignment is then arithmetic: a document
    * spanning [st, st+n) contributes a segment to every window in
    * [st DIV 128, (st+n-1) DIV 128], emitted via sequence + explode —
    * no join, no second shuffle. All-integer arithmetic → the DuckDB
    * oracle (which uses the naive single-task cumsum, fine at oracle
    * scale) hash-matches exactly. */
  def seqPackSegments(spark: SparkSession, dir: String,
      scanBucket: Long = ScanBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n"))
      .where(col("n") > 0)
      .withColumn("bucket", expr(s"doc_id DIV $scanBucket"))
    val intra = counts.withColumn("run",
      sum(col("n")).over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // the bucket-offset cumsum is UNPARTITIONED by design: its input is
    // one row per `scanBucket` documents, so the single task handles
    // corpus/scanBucket rows (10^11 docs at the default bucket → 10^8
    // tiny rows — still fine). ESCAPE HATCH if even that overflows one
    // task: apply this same two-level split recursively to the bucket
    // table (bucket the buckets by `bucket DIV scanBucket`) — depth 2
    // covers scanBucket² ≈ 10^12 buckets; `scanBucket` is a parameter so
    // callers can also just widen the buckets.
    val bucketOffsets = counts.groupBy(col("bucket")).agg(sum(col("n")).as("bn"))
      .withColumn("boff",
        sum(col("bn")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("bn"))
      .select(col("bucket"), col("boff"))
    val offsets = intra.join(broadcast(bucketOffsets), Seq("bucket"))
      .select(col("doc_id"), col("n"), (col("boff") + col("run") - col("n")).as("st"))
    offsets
      .select(col("doc_id"), col("n"), col("st"),
        explode(sequence(expr(s"st DIV $Ctx"), expr(s"(st + n - 1) DIV $Ctx"))).as("window_id"))
      .select(col("window_id"), col("doc_id"),
        (greatest(col("window_id") * Ctx, col("st")) - col("st")).as("seg_start"),
        (least((col("window_id") + 1) * Ctx, col("st") + col("n")) -
          greatest(col("window_id") * Ctx, col("st"))).as("seg_len"))
  }

  def q81SeqPack(spark: SparkSession, dir: String): DataFrame =
    seqPackSegments(spark, dir).orderBy(col("window_id"), col("doc_id"))

  private val RagChunkToks = 32
  private val RagStride = 24 // 8-token (25%) overlap between neighbors

  /** q159: overlapping RAG chunking — the retrieval-ingestion chunker
    * (fixed token windows with stride overlap, so a sentence near a
    * boundary is whole in at least one chunk). The packing family's
    * complement: q81/q82 tile the corpus EXACTLY for training (no
    * overlap, document-agnostic windows); a retrieval index needs
    * per-document chunks WITH overlap. One row per chunk: (doc_id,
    * chunk_idx, start_tok, n_toks, chunk_text).
    *
    * Chunk starts step by [[RagStride]]; a tail start whose content is
    * fully inside the previous chunk (start ≥ n − overlap, start ≠ 0)
    * is dropped — every chunk contributes ≥ 1 new token, every token
    * is in ≥ 1 chunk. Entirely MAP-SIDE: tokenize, posexplode the
    * start sequence, slice — no shuffle anywhere (the board sort is
    * presentation). At 100 TB this is the shape that matters: chunking
    * is embarrassingly parallel and must never pay a join or window. */
  def q159RagChunks(spark: SparkSession, dir: String): DataFrame = {
    val overlap = RagChunkToks - RagStride
    documents(spark, dir)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ws"), col("n"),
        posexplode(sequence(lit(0L), col("n") - 1, lit(RagStride.toLong))))
      .where(col("col") === 0 || col("col") < col("n") - overlap)
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("start_tok"),
        least(lit(RagChunkToks.toLong), col("n") - col("col")).as("n_toks"),
        array_join(slice(col("ws"), (col("col") + 1).cast("int"), lit(RagChunkToks)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val q159Sql: String = {
    val overlap = RagChunkToks - RagStride
    "WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws, " +
      "CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n FROM documents " +
      "WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0), " +
      s"s AS (SELECT doc_id, ws, n, unnest(range(0, n, $RagStride)) AS start FROM t), " +
      s"f AS (SELECT doc_id, ws, n, start, CAST(start // $RagStride AS BIGINT) AS chunk_idx " +
      s"FROM s WHERE start = 0 OR start < n - $overlap) " +
      s"SELECT doc_id, chunk_idx, start AS start_tok, least($RagChunkToks, n - start) AS n_toks, " +
      s"array_to_string(ws[CAST(start + 1 AS BIGINT):CAST(start + $RagChunkToks AS BIGINT)], ' ') AS chunk_text " +
      "FROM f ORDER BY doc_id, chunk_idx"
  }

  /** Sequence packing PAYLOAD: materialize the actual token content of
    * every 128-token context window — what a trainer consumes; q81's
    * layout map is the pointer form of this. One row per window:
    * (window_id, n_segs, n_tokens, window_text), window_text being the
    * concatenated token stream of its segments in doc_id order.
    *
    * Scale shape: the layout comes from `seqPackSegments` (token COUNTS
    * only — the payload never rides through the cumsum machinery); the
    * token arrays then join in by doc_id and each segment slices out
    * only its own [seg_start, seg_start+seg_len) token range, so the
    * groupBy(window_id) shuffle carries each corpus token exactly once.
    * Payload movement is 2 passes total (doc_id join + window shuffle) —
    * the minimum for re-laying out a doc-ordered corpus into windows.
    * Per-window state is bounded by construction: a window holds at most
    * 128 tokens, so collect_list can never blow up a task. */
  def q82SeqPackPayload(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("ws"))
    seqPackSegments(spark, dir)
      .join(toks, Seq("doc_id"))
      .select(col("window_id"), col("doc_id"), col("seg_len"),
        slice(col("ws"), (col("seg_start") + 1).cast("int"),
          col("seg_len").cast("int")).as("seg"))
      .groupBy(col("window_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(col("seg_len")).as("n_tokens"),
        // a doc contributes at most one segment per window, so doc_id
        // alone orders the struct sort; flatten stitches the segments
        // into the window's token stream
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("doc_id"), col("seg")))),
          x => x.getField("seg"))), " ").as("window_text"))
      .orderBy(col("window_id"))
  }

  val q81Sql: String =
    "WITH w AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n FROM documents), " +
      "o AS (SELECT doc_id, n, CAST(sum(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS st FROM w WHERE n > 0), " +
      s"s AS (SELECT doc_id, n, st, unnest(range(st // $Ctx, (st + n - 1) // $Ctx + 1)) AS window_id FROM o) " +
      s"SELECT window_id, doc_id, greatest(window_id*$Ctx, st) - st AS seg_start, " +
      s"least((window_id+1)*$Ctx, st + n) - greatest(window_id*$Ctx, st) AS seg_len " +
      "FROM s ORDER BY window_id, doc_id"

  // q82: same CTE chain as q81 but carrying the token list, then slicing
  // each segment's token range and string_agg-ing per window in doc_id
  // order (DuckDB list slicing is 1-based inclusive on both ends).
  val q82Sql: String =
    "WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents), " +
      "o AS (SELECT doc_id, ws, len(ws) AS n, CAST(sum(len(ws)) OVER (ORDER BY doc_id) - len(ws) AS BIGINT) AS st " +
      "FROM w WHERE len(ws) > 0), " +
      s"s AS (SELECT doc_id, ws, n, st, unnest(range(st // $Ctx, (st + n - 1) // $Ctx + 1)) AS window_id FROM o), " +
      s"seg AS (SELECT window_id, doc_id, ws, greatest(window_id*$Ctx, st) - st AS a, " +
      s"least((window_id+1)*$Ctx, st + n) - greatest(window_id*$Ctx, st) AS l FROM s) " +
      "SELECT window_id, count(*) AS n_segs, CAST(sum(l) AS BIGINT) AS n_tokens, " +
      "string_agg(array_to_string(ws[(a+1):(a+l)], ' '), ' ' ORDER BY doc_id) AS window_text " +
      "FROM seg GROUP BY window_id ORDER BY window_id"

  /** CDC MERGE / upsert apply: base table + a change set (inserts,
    * updates, deletes) → the post-merge table, with provenance. The
    * change set is synthesized deterministically from `orders` (keys
    * ending 3 → price update, 7 → delete, 5 → an insert under a shifted
    * key) so the oracle can rebuild the identical changes and check the
    * exact merged rows.
    *
    * Scale shape: the change set is BROADCAST (a CDC batch is tiny next
    * to the base table), so the base scan never shuffles — untouched rows
    * stream through a broadcast anti-join, updated rows through a
    * broadcast inner join, and inserts append. That is the whole MERGE at
    * any base-table size: zero exchanges on the 100 TB side. (A change
    * set too big to broadcast shuffle-joins on the same key instead —
    * one exchange, same plan otherwise.) */
  def q85MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    // The change-set arithmetic must be EXACT in IEEE, not rounded:
    // round(x·1.1, 2) diverged at sf0.1 (orderkey 18603 → product with
    // shortest-decimal repr ...915: Spark's Round goes through
    // BigDecimal.valueOf — the shortest DECIMAL string — and HALF_UPs to
    // .92, while DuckDB rounds the exact binary value ...91499… down to
    // .91). x·2.0 is an exponent bump — exact for every finite double,
    // no rounding step on either engine, bit-stable at any SF.
    val upd = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), (col("o_totalprice") * 2.0).as("new_price"))
    val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 7).select(col("o_orderkey"))
    val ins = base.filter(pmod(col("o_orderkey"), lit(10)) === 5)
      .select((col("o_orderkey") + 20000000L).as("o_orderkey"), col("o_custkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"), lit("ins").as("src"))
    val touched = upd.select(col("o_orderkey")).union(del)
    val untouched = base.join(broadcast(touched), Seq("o_orderkey"), "left_anti")
      .withColumn("src", lit("base"))
    val updated = base.join(broadcast(upd), "o_orderkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("new_price").as("o_totalprice"), lit("upd").as("src"))
    untouched.unionByName(updated).unionByName(ins).orderBy(col("o_orderkey"))
  }

  val q85Sql: String =
    "WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders), " +
      "upd AS (SELECT o_orderkey, o_totalprice * CAST(2.0 AS DOUBLE) AS new_price FROM base WHERE o_orderkey % 10 = 3), " +
      "del AS (SELECT o_orderkey FROM base WHERE o_orderkey % 10 = 7) " +
      "SELECT * FROM (" +
      "SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice, 'base' AS src FROM base b " +
      "WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd) AND b.o_orderkey NOT IN (SELECT o_orderkey FROM del) " +
      "UNION ALL " +
      "SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, u.new_price, 'upd' FROM base b JOIN upd u USING (o_orderkey) " +
      "UNION ALL " +
      "SELECT o_orderkey + 20000000, o_custkey, 'N', o_totalprice, 'ins' FROM base WHERE o_orderkey % 10 = 5" +
      ") ORDER BY o_orderkey"

  /** Number of shards in the epoch shuffle (q88). */
  private val Shards = 8L

  /** Deterministic epoch shuffle: the global pseudo-random re-ordering a
    * training run applies to the corpus each epoch, sharded for parallel
    * consumption. Shard assignment AND within-shard order both derive
    * from md5(doc_id ‖ epoch salt) — change the salt, get an independent
    * permutation; rerun the same salt anywhere, get the identical layout
    * (the q57 content-hash idiom: no RNG stream, no partitioning
    * dependence).
    *
    * Scale shape: the only ordering step is a row_number window
    * PARTITIONED BY shard — each shard sorts independently in parallel,
    * so there is no global single-task sort; 100 TB runs pick shards ≈
    * executor count and every shard is a separate sort of corpus/shards
    * rows. The hash prefix decides the shard, so shard sizes concentrate
    * tightly around corpus/shards (binomial). */
  def q88EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(col("doc_id").cast("string"), lit("|graft-epoch-1")))
    documents(spark, dir)
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(conv(substring(col("h"), 1, 2), 16, 10).cast("long"), lit(Shards)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

  // DuckDB has no conv(); the 2-hex-digit byte decodes via strpos
  // arithmetic (the q83 idiom), which equals Spark's conv(...,16,10).
  val q88Sql: String = {
    val byte = "((strpos('0123456789abcdef', substr(h,1,1))-1)*16 + (strpos('0123456789abcdef', substr(h,2,1))-1))"
    "WITH s AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|graft-epoch-1') AS h FROM documents), " +
      s"sh AS (SELECT doc_id, h, $byte % $Shards AS shard FROM s) " +
      "SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos, doc_id " +
      "FROM sh ORDER BY shard, pos"
  }

  /** Token-count histogram width (q92). */
  private val HistWidth = 50L
  /** Token-count histogram bucket count (q92; last bucket open-ended). */
  private val HistBuckets = 10L

  /** Document length histogram: equi-width buckets of per-doc token
    * counts (width 50, last bucket open-ended), with per-bucket share of
    * the corpus — the length profile batch planners and truncation
    * policies read before packing (q81/q82 fix the context budget; this
    * is how you pick it). One scan + one tiny shuffle of 10 grouped
    * rows; the share divides by a window total over those same 10 rows
    * (unpartitioned, but post-aggregation — bucket-count rows, never
    * data rows). Integer/integer → double division, unrounded
    * (bit-identical, q22 policy). */
  def q92LengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
      .cast("long")
    documents(spark, dir)
      .select(least(n.divide(HistWidth).cast("long"), lit(HistBuckets - 1)).as("bucket"),
        n.as("n_tokens"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .withColumn("share", col("n_docs").cast("double") /
        sum(col("n_docs")).over(Window.partitionBy()).cast("double"))
      .orderBy(col("bucket"))
  }

  val q92Sql: String =
    s"WITH n AS (SELECT CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens FROM documents), " +
      s"b AS (SELECT least(n_tokens // $HistWidth, ${HistBuckets - 1}) AS bucket, n_tokens FROM n) " +
      "SELECT bucket, count(*) AS n_docs, min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens, " +
      "CAST(count(*) AS DOUBLE) / sum(count(*)) OVER () AS share " +
      "FROM b GROUP BY bucket ORDER BY bucket"

  /** q100: per-source quota cap — the anti-domination pass every
    * web-scale mix applies (C4/RefinedWeb-style: no single domain may
    * contribute more than N documents). Selection WITHIN a source is by
    * content-hash priority (the q57 idiom), so which docs survive is a
    * pure function of the data — identical on any cluster, any
    * partitioning, any rerun, and exactly reproducible in the oracle —
    * rather than an arbitrary "first N encountered". Plan shape: one
    * window partitioned by source. Parallelism = |sources| (millions of
    * domains at web scale — saturates any cluster); a single mega-source
    * bounds its own partition at that source's doc count, and the cap
    * output is ≤ N·|sources| rows. */
  def q100SourceQuota(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Cap = 10
    val pr = md5(concat(col("doc_id").cast("string"), lit("|graft-quota-1")))
    val w = Window.partitionBy(col("source")).orderBy(pr.asc, col("doc_id").asc)
    documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= Cap)
      .orderBy(col("doc_id"))
  }

  val q100Sql: String =
    "SELECT doc_id, source, rk FROM (" +
      "SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source " +
      "ORDER BY md5(CAST(doc_id AS VARCHAR) || '|graft-quota-1'), doc_id) AS rk " +
      "FROM documents) WHERE rk <= 10 ORDER BY doc_id"

  /** q103: exact-size weighted sample without replacement — the
    * Efraimidis–Spirakis A-ES scheme (Inf. Process. Lett. 2006): each
    * row gets key u^(1/w) for uniform u, the k largest keys ARE a
    * weighted sample without replacement. The distributed-sampling
    * workhorse: one scan, per-row arithmetic, TakeOrdered top-k — no
    * global sort, no driver-side passes, composable with any weight
    * column. Here w = document length in chars (longer docs
    * proportionally likelier), k = 100.
    *
    * Determinism: u derives from the md5 content-hash idiom (q57) —
    * the first 8 hex digits parsed as an integer (Spark `conv`,
    * DuckDB `CAST('0x'||… AS BIGINT)`), +1 so u > 0 — so the sample is
    * identical on any cluster, any partitioning, any rerun, and the
    * oracle replays it exactly. Ranking maximizes u^(1/w) ⇔ ln(u)/w
    * (monotone); the emitted key is 6-decimal rounded and the sort uses
    * the rounded key with doc_id tiebreak (q101's ln-ulp policy). */
  def q103WeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING) || '|graft-aes-1'), 1, 8), 16, 10) AS BIGINT)") + 1L)
      .cast("double") / lit(4294967296.0)
    documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("key", round(log(u) / greatest(col("n_chars"), lit(1L)).cast("double"), 6))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(100)
  }

  val q103Sql: String =
    "SELECT doc_id, n_chars, round(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|graft-aes-1'), 1, 8) AS BIGINT) + 1) / 4294967296.0) " +
      "/ CAST(greatest(n_chars, 1) AS DOUBLE), 6) AS key " +
      "FROM documents ORDER BY key DESC, doc_id LIMIT 100"

  /** q107: budgeted mixture fill — take documents per language, in
    * deterministic content-hash priority order, until each language's
    * CHARACTER budget is exhausted (en 200k chars, de 100k, everything
    * else 50k). This is how a training mix is actually assembled: q70
    * applies per-domain RATES, this hits per-domain absolute BUDGETS —
    * the knob a token-budgeted pretraining run needs. A doc is kept iff
    * the running total INCLUDING it still fits (first doc always
    * considered; oversized later docs are skipped by the budget, not
    * truncated). Plan: one window per language (cumsum over the hash
    * order) + a filter — parallelism = |languages| at web scale, same
    * posture as q100. */
  def q107BudgetMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = when(col("lang") === "en", 200000L)
      .when(col("lang") === "de", 100000L)
      .otherwise(50000L)
    val pr = md5(concat(col("doc_id").cast("string"), lit("|graft-budget-1")))
    val w = Window.partitionBy(col("lang")).orderBy(pr.asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("cum_chars", sum(col("n_chars")).over(w))
      .where(col("cum_chars") <= budget)
      .orderBy(col("doc_id"))
  }

  /** q111: temperature mixture reweighting — the mT5/multilingual-Pile
    * allocation step that sits UPSTREAM of q70 (rates) and q107
    * (budgets): given the corpus's natural per-language character mass
    * p_i, a temperature α < 1 flattens the sampling distribution toward
    * the tail languages, q_i = p_i^α / Σ_j p_j^α (α = 0.3, the mT5
    * setting). The total corpus mass cancels algebraically
    * (q_i = chars_i^α / Σ chars_j^α), so the plan needs no second
    * normalization pass: one partial-agg groupBy(lang) down to |langs|
    * rows, then the 1-row Σ statistics attach by broadcast cross-join
    * (the q72 idiom). `oversample = q/p` (rounded) is the epochs-of-
    * its-natural-share factor a trainer applies per language.
    *
    * At 100 TB the groupBy is one map-side-combined shuffle emitting
    * |langs| rows; everything after operates on broadcast scalars.
    * Doubles: pow/ln values are irrational-ish, so round(.,6) renders
    * identically cross-engine (the PERF.md round-tie policy — ties at
    * the 6th decimal have measure ~0 for these, unlike prices). */
  def q111TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val Alpha = 0.3
    val byLang = documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
    val stats = byLang.agg(
      sum(col("chars")).as("total_chars"),
      sum(pow(col("chars").cast("double"), Alpha)).as("spow"))
    byLang.crossJoin(broadcast(stats))
      .select(
        col("lang"), col("n_docs"), col("chars"),
        round(col("chars").cast("double") / col("total_chars").cast("double"), 6).as("p"),
        round(pow(col("chars").cast("double"), Alpha) / col("spow"), 6).as("q"),
        round(pow(col("chars").cast("double"), Alpha) / col("spow") /
          (col("chars").cast("double") / col("total_chars").cast("double")), 6).as("oversample"))
      .orderBy(col("lang"))
  }

  val q111Sql: String =
    "WITH by_lang AS (SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents GROUP BY lang), " +
      "stats AS (SELECT SUM(chars) AS total_chars, SUM(pow(CAST(chars AS DOUBLE), 0.3)) AS spow FROM by_lang) " +
      "SELECT lang, n_docs, chars, " +
      "round(CAST(chars AS DOUBLE) / CAST(total_chars AS DOUBLE), 6) AS p, " +
      "round(pow(CAST(chars AS DOUBLE), 0.3) / spow, 6) AS q, " +
      "round(pow(CAST(chars AS DOUBLE), 0.3) / spow / (CAST(chars AS DOUBLE) / CAST(total_chars AS DOUBLE)), 6) AS oversample " +
      "FROM by_lang CROSS JOIN stats ORDER BY lang"

  /** q143: declarative data-quality expectations — the dbt-test /
    * Great-Expectations-style constraint audit every pipeline runs
    * before trusting a table: each named expectation compiles to a
    * violation COUNT over the data, and the report is one row per
    * check (name, n_violations, pass). Checks cover the four standard
    * families over the star schema:
    *   - not-null         (lineitem.l_orderkey)
    *   - accepted range   (l_quantity in [1, 50]; l_discount in [0, 0.1])
    *   - uniqueness       ((l_orderkey, l_linenumber) is a key)
    *   - referential      (orders.o_custkey -> customer.c_custkey)
    *
    * Scale shape: every scan-family check partial-aggregates its
    * violation count map-side in ONE pass over the table (a shared
    * conditional-sum aggregate — adding a check adds a column, not a
    * scan); uniqueness is one groupBy on the key with a HAVING-style
    * filter aggregated to a count; the FK check is a broadcast-able
    * anti-join count (dimension side small — at scale Spark picks
    * SMJ/shuffle-hash on the same key). The report unions five 1-row
    * frames — driver-sized. All counts exact integers → bit-exact
    * cross-engine. */
  def q143Expectations(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    // one pass, all scan-family checks as conditional sums — then
    // UNPIVOTED to report rows with stack() over the single aggregate
    // row. (A select-per-check + union re-evaluates the aggregate —
    // and its corpus scan — once per branch: three scans for three
    // checks, caught by the PlanQualitySpec pin.)
    val scanRows = li.agg(
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("nn"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)).as("qr"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L)).as("dr"))
      .select(expr("stack(3, " +
        "'lineitem.l_orderkey not_null', nn, " +
        "'lineitem.l_quantity in [1,50]', qr, " +
        "'lineitem.l_discount in [0,0.1]', dr) AS (check, n_violations)"))
    val dupRow = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1)
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
      .select(lit("lineitem (l_orderkey,l_linenumber) unique").as("check"),
        col("n_violations"))
    val fkRow = orders(spark, dir).select(col("o_custkey"))
      .join(broadcast(customer(spark, dir).select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders.o_custkey references customer").as("check"),
        col("n_violations"))
    scanRows.unionByName(dupRow).unionByName(fkRow)
      .select(col("check"), col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("pass"))
      .orderBy(col("check"))
  }

  val q143Sql: String =
    "WITH scan AS (SELECT " +
      "CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn, " +
      "CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS qr, " +
      "CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS dr " +
      "FROM lineitem), " +
      "dup AS (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS v FROM " +
      "(SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)), " +
      // NOT EXISTS (not NOT IN): matches left_anti semantics even if a
      // key column ever holds NULL — NOT IN's three-valued logic would
      // silently diverge (one NULL c_custkey zeroes the whole count).
      "fk AS (SELECT CAST(count(*) AS BIGINT) AS v FROM orders " +
      "WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)), " +
      "rep AS (" +
      "SELECT 'lineitem.l_orderkey not_null' AS check_name, nn AS n_violations FROM scan " +
      "UNION ALL SELECT 'lineitem.l_quantity in [1,50]', qr FROM scan " +
      "UNION ALL SELECT 'lineitem.l_discount in [0,0.1]', dr FROM scan " +
      "UNION ALL SELECT 'lineitem (l_orderkey,l_linenumber) unique', v FROM dup " +
      "UNION ALL SELECT 'orders.o_custkey references customer', v FROM fk) " +
      "SELECT check_name AS \"check\", n_violations, " +
      "CAST(n_violations = 0 AS INTEGER) AS pass FROM rep ORDER BY \"check\""

  /** q139: class-balanced oversampling with replacement — the trainer-
    * side rebalancing step that sits DOWNSTREAM of q111's allocation
    * math: materialize an epoch in which every language contributes
    * exactly `target = max_lang_count` examples by replicating each
    * document a deterministic number of times. Replication counts are
    * exact by construction: every doc of a language gets
    * floor(target / n) copies, and the first (target mod n) docs in
    * content-hash order (the q57/q100 priority idiom) get one more —
    * so Σ copies = target per language, no RNG, identical on any
    * cluster/rerun and replayable by the oracle. Emitting (doc_id,
    * copy) pairs rather than duplicated payloads keeps the output a
    * layout map (the q81 philosophy): the trainer joins text back by
    * doc_id.
    *
    * Scale shape: one |langs|-row partial agg broadcast back onto the
    * scan, one window per language for the priority rank (parallelism
    * = |langs| — at web scale this keys on thousands of
    * lang×source strata), then a map-side sequence() explode. No
    * corpus-scale shuffle beyond the rank window. */
  def q139BalancedOversample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val target = byLang.agg(max(col("n_lang")).as("target"))
    val pr = md5(concat(col("doc_id").cast("string"), lit("|graft-balance-1")))
    val w = Window.partitionBy(col("lang")).orderBy(pr.asc, col("doc_id").asc)
    documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(byLang), "lang")
      .crossJoin(broadcast(target))
      .withColumn("n_copies",
        // true integer floor (`div`), structurally identical to the
        // oracle's `//` — Long/Long `/` would route through a Double
        // and only matches while counts fit double's 53-bit mantissa
        expr("target div n_lang") +
          when(col("rk") <= col("target") % col("n_lang"), 1L).otherwise(0L))
      .select(col("doc_id"), col("lang"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }

  val q139Sql: String =
    "WITH by_lang AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1), " +
      "t AS (SELECT max(n_lang) AS target FROM by_lang), " +
      "ranked AS (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang " +
      "ORDER BY md5(CAST(doc_id AS VARCHAR) || '|graft-balance-1'), doc_id) AS rk " +
      "FROM documents), " +
      "reps AS (SELECT doc_id, lang, " +
      "CAST(target // n_lang + CASE WHEN rk <= target % n_lang THEN 1 ELSE 0 END AS BIGINT) AS n_copies " +
      "FROM ranked JOIN by_lang USING (lang) CROSS JOIN t) " +
      "SELECT doc_id, lang, n_copies, unnest(generate_series(1, n_copies)) AS copy " +
      "FROM reps ORDER BY doc_id, copy"

  val q107Sql: String =
    "SELECT doc_id, lang, n_chars, cum_chars FROM (" +
      "SELECT doc_id, lang, n_chars, " +
      "CAST(sum(n_chars) OVER (PARTITION BY lang " +
      "ORDER BY md5(CAST(doc_id AS VARCHAR) || '|graft-budget-1'), doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars " +
      "FROM documents) " +
      "WHERE cum_chars <= CASE WHEN lang = 'en' THEN 200000 WHEN lang = 'de' THEN 100000 ELSE 50000 END " +
      "ORDER BY doc_id"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q100_source_quota" -> q100SourceQuota _,
    "q103_weighted_sample" -> q103WeightedSample _,
    "q107_budget_mix" -> q107BudgetMix _,
    "q111_temperature_mix" -> q111TemperatureMix _,
    "q139_balanced_oversample" -> q139BalancedOversample _,
    "q143_expectations" -> q143Expectations _,
    "q56_like_pred" -> q56LikePred _,
    "q57_hash_split" -> q57HashSplit _,
    "q58_stratified_sample" -> q58StratifiedSample _,
    "q70_mixture_sample" -> q70Mixture _,
    "q72_profile" -> q72Profile _,
    "q81_seq_pack" -> q81SeqPack _,
    "q159_rag_chunks" -> q159RagChunks _,
    "q82_seq_pack_payload" -> q82SeqPackPayload _,
    "q85_merge_upsert" -> q85MergeUpsert _,
    "q88_epoch_shuffle" -> q88EpochShuffle _,
    "q92_length_histogram" -> q92LengthHistogram _)

  val oracle: Map[String, String] = Map(
    "q100_source_quota" -> q100Sql,
    "q103_weighted_sample" -> q103Sql,
    "q107_budget_mix" -> q107Sql,
    "q111_temperature_mix" -> q111Sql,
    "q139_balanced_oversample" -> q139Sql,
    "q143_expectations" -> q143Sql,
    "q56_like_pred" -> q56Sql,
    "q57_hash_split" -> q57Sql,
    "q58_stratified_sample" -> q58Sql,
    "q70_mixture_sample" -> q70Sql,
    "q72_profile" -> q72Sql,
    "q81_seq_pack" -> q81Sql,
    "q159_rag_chunks" -> q159Sql,
    "q82_seq_pack_payload" -> q82Sql,
    "q85_merge_upsert" -> q85Sql,
    "q88_epoch_shuffle" -> q88Sql,
    "q92_length_histogram" -> q92Sql)
}
