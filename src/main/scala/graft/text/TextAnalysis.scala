package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators for a training-data pipeline (SURVEY.md §2B
  * extensions row): language ID, quality scoring, token counting, document
  * fingerprinting. All pure codegen'd builtins (regexp/length/md5) — no
  * UDFs — so each query is a single narrow scan-project pipeline that
  * parallelizes embarrassingly at 100 TB (no shuffle except final aggs).
  *
  * Heuristics are deliberately expressible in ANSI SQL so every one of
  * these operators is verified against the DuckDB oracle, not just
  * rows-counted. Regex syntax is kept in the subset Java regex and RE2
  * share (\b word boundaries, \x{...} unicode escapes, \S classes).
  */
object TextAnalysis {

  // NB: functions.regexp_extract_all with lit() patterns, never expr("...")
  // — Spark's SQL parser treats backslash as an escape inside string
  // literals while DuckDB's does not, so going through the function API
  // keeps one canonical pattern string valid for both engines.
  private def hits(pat: String): Column =
    size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")

  private val zhPat = "[\\x{4e00}-\\x{9fff}]"
  private val enPat = "\\b(the|and|of|a)\\b"
  private val dePat = "\\b(der|die|und|das)\\b"
  private val frPat = "\\b(le|la|et|les)\\b"
  private val esPat = "\\b(el|los|y|las)\\b"

  /** n-gram/stopword-count language ID: count stopword hits per language,
    * argmax with fixed precedence (zh by script, then en>de>fr>es). */
  def langIdColumn: Column = {
    val (zh, en, de, fr, es) = (hits(zhPat), hits(enPat), hits(dePat), hits(frPat), hits(esPat))
    when(zh > 0, "zh")
      .when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }

  def q25LangId(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), col("lang"), langIdColumn.as("pred_lang"))
      .orderBy(col("doc_id"))

  val q25Sql: String = {
    def h(p: String) = s"len(regexp_extract_all(text, '$p'))"
    s"SELECT doc_id, lang, CASE WHEN ${h(zhPat)} > 0 THEN 'zh' " +
      s"WHEN ${h(enPat)} >= ${h(dePat)} AND ${h(enPat)} >= ${h(frPat)} AND ${h(enPat)} >= ${h(esPat)} AND ${h(enPat)} > 0 THEN 'en' " +
      s"WHEN ${h(dePat)} >= ${h(frPat)} AND ${h(dePat)} >= ${h(esPat)} AND ${h(dePat)} > 0 THEN 'de' " +
      s"WHEN ${h(frPat)} >= ${h(esPat)} AND ${h(frPat)} > 0 THEN 'fr' " +
      s"WHEN ${h(esPat)} > 0 THEN 'es' ELSE 'und' END AS pred_lang " +
      "FROM documents ORDER BY doc_id"
  }

  /** Quality scoring: token count, average token length, stopword ratio,
    * and a composite score — the usual cheap pre-filters before expensive
    * dedup/embedding stages in a data pipeline. */
  /** The q26 quality score as a reusable (Column, SQL) pair — shared by
    * q26 and the q115 quality-aware keep-list so the two can never
    * silently diverge on what "quality" means. Bit-deterministic
    * cross-engine: per-row IEEE divisions/products on exact integer
    * inputs, no rounding needed (see the q26 comment below). NULL only
    * for zero-token docs (none exist in any fixture, and the q115
    * cluster universe guarantees >= 3 tokens). */
  private[graft] def qualityScoreCol: Column = {
    val nTokens = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long")
    val stopRatio = hits(enPat).cast("double") / nullif(nTokens, lit(0L)).cast("double")
    least(nTokens.cast("double") / lit(200.0), lit(1.0)) * (lit(1.0) - stopRatio)
  }

  private[graft] val qualityScoreSql: String = {
    val nTok = "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)"
    val stop = s"CAST(len(regexp_extract_all(text, '$enPat')) AS BIGINT)"
    s"least(CAST($nTok AS DOUBLE)/200.0, 1.0) * " +
      s"(1.0 - CAST($stop AS DOUBLE)/CAST(nullif($nTok, 0) AS DOUBLE))"
  }

  def q26Quality(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long")
    val nonSpace = length(regexp_replace(col("text"), " ", "")).cast("long")
    val stopHits = hits(enPat)
    val stopRatio = stopHits.cast("double") / nullif(nTokens, lit(0L)).cast("double")
    // per-row integer divisions and products are bit-deterministic (same
    // IEEE ops on the same exact inputs in both engines) → no rounding,
    // which could otherwise hit decimal ties on binary-exact quotients
    // like 1/32 (see q22)
    documents(spark, dir).select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      (nonSpace.cast("double") / nullif(nTokens, lit(0L)).cast("double")).as("avg_token_len"),
      stopRatio.as("stopword_ratio"),
      qualityScoreCol.as("quality_score"))
      .orderBy(col("doc_id"))
  }

  val q26Sql: String = {
    val nTok = "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)"
    val nonSpace = "CAST(length(replace(text, ' ', '')) AS BIGINT)"
    val stop = s"CAST(len(regexp_extract_all(text, '$enPat')) AS BIGINT)"
    val stopRatio = s"CAST($stop AS DOUBLE)/CAST(nullif($nTok, 0) AS DOUBLE)"
    s"SELECT doc_id, $nTok AS n_tokens, " +
      s"CAST($nonSpace AS DOUBLE)/CAST(nullif($nTok, 0) AS DOUBLE) AS avg_token_len, " +
      s"$stopRatio AS stopword_ratio, " +
      s"$qualityScoreSql AS quality_score " +
      "FROM documents ORDER BY doc_id"
  }

  /** Token statistics per language — whitespace tokenizer aggregated with
    * map-side partial aggregation. */
  /** BPE-ish pre-tokenizer regex (kept in the Java/RE2 shared subset):
    * letter runs, digit runs, and punctuation runs, each optionally
    * preceded by one space — the GPT-2-style split that approximates
    * subword-tokenizer input segmentation (actual merges are vocab-
    * dependent; the count here is the pre-merge piece count). */
  private val bpePat = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+"

  def q27TokenStats(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).cast("long")
    val nBpe = size(regexp_extract_all(lower(col("text")), lit(bpePat), lit(0))).cast("long")
    documents(spark, dir)
      .select(col("lang"), nTokens.as("n_tok"), nBpe.as("n_bpe"))
      .groupBy(col("lang"))
      .agg(sum(col("n_tok")).as("total_tokens"),
        // exact-integer-sum / count, unrounded → bit-identical (see q22);
        // pieces_per_word is ratio-of-sums (corpus-level rate), likewise
        // exact, rather than an order-dependent mean-of-ratios
        (sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tokens"),
        max(col("n_tok")).as("max_tokens"),
        sum(col("n_bpe")).as("total_bpe_pieces"),
        (sum(col("n_bpe")).cast("double") / sum(col("n_tok"))).as("pieces_per_word"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  val q27Sql: String = {
    val nTok = "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT)"
    val nBpe = s"CAST(len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+')) AS BIGINT)"
    s"SELECT lang, CAST(sum(n_tok) AS BIGINT) AS total_tokens, " +
      "CAST(sum(n_tok) AS DOUBLE)/count(*) AS avg_tokens, " +
      "max(n_tok) AS max_tokens, CAST(sum(n_bpe) AS BIGINT) AS total_bpe_pieces, " +
      "CAST(sum(n_bpe) AS DOUBLE)/sum(n_tok) AS pieces_per_word, count(*) AS n_docs " +
      s"FROM (SELECT lang, $nTok AS n_tok, $nBpe AS n_bpe FROM documents) GROUP BY lang ORDER BY lang"
  }

  /** Document fingerprint: md5 of the normalized text (lowercase, non-
    * alphanumeric runs collapsed to single spaces, outer whitespace
    * trimmed so leading/trailing punctuation can't split duplicates),
    * truncated to 64 bits of hex. This is the canonical-form key used by
    * exact dedup at scale. */
  def fingerprintColumn: Column =
    substring(md5(trim(lower(regexp_replace(col("text"), "[^a-zA-Z0-9]+", " ")))), 1, 16)

  def q28Fingerprint(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"), fingerprintColumn.as("fp"))
      .orderBy(col("doc_id"))

  val q28Sql: String =
    "SELECT doc_id, substr(md5(trim(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')))),1,16) AS fp " +
      "FROM documents ORDER BY doc_id"

  /** TF-IDF top-3 terms per document (smoothed idf = ln((N+1)/(df+1))+1).
    * Plan shape: one shuffle on (doc_id, term) for tf, one on term for df,
    * a join on term, and a per-doc window — each step partial-aggregated,
    * nothing driver-side; N arrives via a broadcast 1-row crossJoin so the
    * whole query is one declarative plan. Ranking uses the 6-decimal
    * rounded score (ties→term asc) so libm-vs-Java last-ulp `ln`
    * differences can't flip the order between engines. */
  def q54Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = documents(spark, dir)
    val tokens = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tokens.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0), 6))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rn"))
      .orderBy(col("doc_id"), col("rn"))
  }

  val q54Sql: String =
    "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), " +
      "df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1), " +
      "n AS (SELECT count(*) AS n_docs FROM documents), " +
      "scored AS (SELECT doc_id, term, round(tf * (ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)) + 1.0), 6) AS tfidf " +
      "FROM tf JOIN df USING (term) CROSS JOIN n) " +
      "SELECT doc_id, term, tfidf, rn FROM (" +
      "SELECT doc_id, term, tfidf, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM scored) " +
      "WHERE rn <= 3 ORDER BY doc_id, rn"

  // PII patterns, kept in the Java-regex ∩ RE2 subset like everything
  // else in this file. Replacement order: email first (its local part
  // may contain digits the narrower patterns would half-match), then IP,
  // then phone.
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePat = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** Redact emails / IPv4s / phone numbers — the standard scrub pass a
    * training corpus gets before anything else. Pure codegen'd
    * regexp_replace chain: shuffle-free, embarrassingly parallel. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailPat), lit("[EMAIL]")),
        lit(Ipv4Pat), lit("[IP]")),
      lit(PhonePat), lit("[PHONE]"))

  /** Whitespace-collapse + lowercase canonical form (the normalization
    * half of a scrub-then-normalize ingest stage). */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), lit("\\s+"), lit(" ")))

  /** PII scrub + normalization, oracle-checked per row. The synthetic
    * corpus contains no natural PII (verified: zero digits in any doc),
    * so the query deterministically injects one email/IP/phone derived
    * from doc_id on BOTH engines — every row then exercises every
    * redaction pattern, and the md5 of the scrubbed+normalized text
    * proves the two regex engines replaced exactly the same spans.
    * PiiScrubSpec covers the adversarial cases (multiple hits,
    * boundaries) on crafted strings. */
  def q66PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val inj = concat(col("text"),
      lit("  Contact: User"), col("doc_id").cast("string"),
      lit("@Example.COM  via 10.0.0."), pmod(col("doc_id"), lit(200)).cast("string"),
      lit(" or +303 555 "), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(inj, lit(EmailPat), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(inj, lit(Ipv4Pat), lit(0))).cast("long").as("n_ips"),
        size(regexp_extract_all(inj, lit(PhonePat), lit(0))).cast("long").as("n_phones"),
        md5(normalize(scrubPii(inj))).as("scrub_md5"))
      .orderBy(col("doc_id"))
  }

  val q66Sql: String = {
    val inj = "text || '  Contact: User' || doc_id || '@Example.COM  via 10.0.0.' || " +
      "(doc_id % 200) || ' or +303 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    val scrub = s"regexp_replace(regexp_replace(regexp_replace(t, '$EmailPat', '[EMAIL]', 'g'), " +
      s"'$Ipv4Pat', '[IP]', 'g'), '$PhonePat', '[PHONE]', 'g')"
    s"WITH inj AS (SELECT doc_id, $inj AS t FROM documents) " +
      s"SELECT doc_id, CAST(len(regexp_extract_all(t, '$EmailPat')) AS BIGINT) AS n_emails, " +
      s"CAST(len(regexp_extract_all(t, '$Ipv4Pat')) AS BIGINT) AS n_ips, " +
      s"CAST(len(regexp_extract_all(t, '$PhonePat')) AS BIGINT) AS n_phones, " +
      s"md5(trim(regexp_replace(lower($scrub), '\\s+', ' ', 'g'))) AS scrub_md5 " +
      "FROM inj ORDER BY doc_id"
  }

  /** Gopher-style repetition scoring: the fraction of duplicated word
    * 2-grams per document — the classic filter for boilerplate/spammy
    * text in a training corpus. Shuffle-free scan-project (the n-gram
    * list never leaves its row); the ratio is integer/integer division,
    * bit-identical across engines unrounded (PERF.md policy). */
  def q68Repetition(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"),
        transform(sequence(lit(0), size(col("ws")) - 2),
          i => concat(element_at(col("ws"), i + 1), lit(" "),
            element_at(col("ws"), i + 2))).as("gs"))
      .select(col("doc_id"),
        size(col("gs")).cast("long").as("n_2grams"),
        size(array_distinct(col("gs"))).cast("long").as("n_distinct"))
      .withColumn("rep_ratio",
        (col("n_2grams") - col("n_distinct")).cast("double") / col("n_2grams").cast("double"))
      .orderBy(col("doc_id"))

  val q68Sql: String =
    "WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents), " +
      "g AS (SELECT doc_id, list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS gs " +
      "FROM w WHERE len(ws) >= 2) " +
      "SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_2grams, " +
      "CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct, " +
      "CAST(len(gs) - len(list_distinct(gs)) AS DOUBLE) / len(gs) AS rep_ratio " +
      "FROM g ORDER BY doc_id"

  /** Benchmark decontamination: flag corpus documents sharing any 3-gram
    * shingle with a (small) benchmark set — here the docs with
    * doc_id % 100 = 0 stand in for the benchmark. The probe side is tiny
    * by nature, so it broadcasts: the corpus scan stays shuffle-free up
    * to the final per-doc count — exactly how test-set overlap checks
    * run over a 100 TB corpus against a few MB of eval data. */
  def q69Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    // cached: both the probe branch and the corpus branch read it, and
    // tokenize+shingle is the expensive part of the query; registered for
    // harness-side unpersist (graft.Caches)
    val sh = graft.Caches.register(graft.dedup.Dedup.shingles(spark, dir).cache())
    val probe = sh.where(pmod(col("doc_id"), lit(100)) === 0)
      .select(explode(col("shingles")).as("s")).distinct()
    sh.where(pmod(col("doc_id"), lit(100)) =!= 0)
      .select(col("doc_id"), explode(col("shingles")).as("s"))
      .join(broadcast(probe), "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  val q69Sql: String =
    "WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(ws)-1), " +
      "i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles FROM w WHERE len(ws) >= 3), " +
      "probe AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 100 = 0), " +
      "e AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 100 <> 0) " +
      "SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hits " +
      "FROM e JOIN probe ON e.s = probe.s GROUP BY e.doc_id ORDER BY e.doc_id"

  /** Unigram-LM cross-entropy scoring (the KenLM-style perplexity filter
    * every pretraining pipeline runs, reduced to its order-0 core): fit an
    * add-one-smoothed unigram model on the corpus, score each document by
    * its mean negative log-likelihood. Low = in-distribution text, high =
    * noise/outliers — the standard cheap quality gate after dedup.
    *
    * Plan shape: one shuffle for per-doc term frequencies, one for corpus
    * counts; the model (term → count) joins back by BROADCAST — a unigram
    * vocab is MBs even on a 100 TB corpus (heavy-tailed, and a count
    * floor would cap it further), so the corpus-side tf table never
    * shuffles again. Scoring sums tf·ln p over a doc's DISTINCT terms
    * (not one addend per token), keeping the float summand count small;
    * the 6-decimal round absorbs summation-order and libm-vs-Java ln ulp
    * differences (q54 policy). If the vocab ever outgrew broadcast, the
    * join key is `term` — the same shuffle q54's df join already takes. */
  def q84UnigramLm(spark: SparkSession, dir: String): DataFrame =
    unigramScoresOf(spark, dir).orderBy(col("doc_id"))

  /** The q84 score table UNSORTED (doc_id, n_tokens, cross_entropy) —
    * shared by q84 (which adds the board sort) and q156's CCNet split,
    * mirroring the oracle-side CTE sharing so "score" can never diverge
    * between them. */
  def unigramScoresOf(spark: SparkSession, dir: String): DataFrame = {
    val toks = documents(spark, dir).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("term"))
    // cached: corpus counts derive FROM tf (cf = Σ tf per term), so the
    // corpus tokenizes and shuffles raw tokens exactly once — cf's second
    // shuffle moves already-grouped (term, tf) rows, ~tokens/doc smaller.
    // Registered for harness-side unpersist (graft.Caches).
    val tf = graft.Caches.register(
      toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).cache())
    val cf = tf.groupBy(col("term")).agg(sum(col("tf")).as("cf"))
    val totals = cf.agg(sum(col("cf")).as("n_corpus"), count(lit(1)).as("vocab"))
    tf.join(broadcast(cf), "term").crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        round(-sum(col("tf").cast("double") *
            log((col("cf") + 1).cast("double") / (col("n_corpus") + col("vocab")).cast("double"))) /
          sum(col("tf")), 6).as("cross_entropy"))
  }

  /** The q84 per-doc score as shared DuckDB CTEs (ends at `sc`), reused
    * by q156 so the two can never diverge on what the score is. */
  private val unigramScoreCtes: String =
    "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2), " +
      "cf AS (SELECT term, count(*) AS cf FROM tok GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(cf) AS BIGINT) AS n_corpus, count(*) AS vocab FROM cf), " +
      "sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, " +
      "round(-sum(tf * ln(CAST(cf + 1 AS DOUBLE) / (n_corpus + vocab))) / sum(tf), 6) AS cross_entropy " +
      "FROM tf JOIN cf USING (term) CROSS JOIN tot GROUP BY doc_id)"

  val q84Sql: String =
    unigramScoreCtes + " SELECT doc_id, n_tokens, cross_entropy FROM sc ORDER BY doc_id"

  /** q156: CCNet-style perplexity split (Wenzek et al. 2020 — the
    * curation stage the public Common-Crawl pipelines ship): rank each
    * document by its LM score WITHIN ITS LANGUAGE and cut every
    * language's distribution into terciles — `head` (lowest cross
    * entropy = most natural), `middle`, `tail`. Per-language ranking is
    * the point: absolute LM scores are not comparable across languages
    * (different vocab sizes and token statistics), so a global cut
    * would keep only the dominant language's head.
    *
    * Scale shape: the score table is q84's single tf shuffle; the split
    * adds ONE window per language (partition-bounded — |lang| keys) and
    * a broadcast-sized join on doc_id. ntile is an exact integer rank
    * function over a total order (round-6 score, doc_id tiebreak), so
    * both engines assign identical buckets — no percentile
    * interpolation anywhere (the q123 median-ulp trap never arises). */
  def q156CcnetSplit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sc = unigramScoresOf(spark, dir).select(col("doc_id"), col("cross_entropy"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cross_entropy"), col("doc_id"))
    documents(spark, dir).select(col("doc_id"), col("lang"))
      .join(sc, "doc_id")
      .withColumn("nt", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("cross_entropy"),
        when(col("nt") === 1, "head").when(col("nt") === 2, "middle")
          .otherwise("tail").as("split"))
      .orderBy(col("doc_id"))
  }

  val q156Sql: String =
    unigramScoreCtes + ", " +
      "j AS (SELECT d.doc_id, d.lang, sc.cross_entropy FROM documents d JOIN sc ON d.doc_id = sc.doc_id) " +
      "SELECT doc_id, lang, cross_entropy, " +
      "CASE ntile(3) OVER (PARTITION BY lang ORDER BY cross_entropy, doc_id) " +
      "WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS split " +
      "FROM j ORDER BY doc_id"

  /** q101: BM25 top-k lexical retrieval (Robertson/Spärck Jones; the
    * Okapi formula every search engine ships) — the missing lexical
    * member of the retrieval family (exact cosine q33, SRP-LSH q35,
    * IVF q55, int8 q86). Fixed 3-term query (the q33 fixed-vector
    * idiom); k1 = 1.2, b = 0.75.
    *
    * Scale shape: tokens filter to the query terms BEFORE any shuffle
    * (tf is |terms|·|matching docs| rows, not corpus tokens); doc
    * lengths are one corpus-wide partial-agg pass; df and the corpus
    * stats broadcast back. Determinism: ranking sorts the 6-decimal
    * ROUNDED score (ties → doc_id), the q54 policy that absorbs
    * libm-vs-Java ln ulp differences; avgdl = Σdl/N is an exact
    * long-sum division, identical in both engines. */
  def q101Bm25Topk(spark: SparkSession, dir: String): DataFrame = {
    val qTerms = Seq("hash", "join", "vector")
    val (k1, b) = (1.2, 0.75)
    // cached: the doc-length pass and the query-term tf pass both read
    // the exploded token table — tokenize the corpus once, not twice
    // (the q84 idiom). Registered for harness-side unpersist.
    val toks = graft.Caches.register(
      documents(spark, dir).select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("term"))
        .cache())
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    // literal shapes mirror the oracle SQL op-for-op (k1+1 = 2.2 and
    // 1-b = 0.25 are bit-exact double constants on both sides)
    val w = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    tf.join(broadcast(df), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * w), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)
  }

  val q101Sql: String =
    "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents), " +
      "lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('hash','join','vector') GROUP BY 1, 2), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
      "stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens) " +
      "SELECT doc_id, round(sum(" +
      "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) * " +
      "(CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))" +
      "), 6) AS bm25 " +
      "FROM tf JOIN df USING (term) JOIN lens USING (doc_id) CROSS JOIN stats " +
      "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"

  /** q114: naive-Bayes quality/domain classifier — train AND inference in
    * one dataflow. The model-based filter every web-scale pipeline runs
    * after the heuristic gates (GPT-3's LR-vs-WebText classifier, CCNet's
    * fastText stage), reduced to its deterministic multinomial-NB core:
    * fit per-term add-one-smoothed class log-odds on a labeled train
    * split (positive = a fixed "curated" source allowlist, split = the
    * q57 doc_id-hash idiom), then score EVERY document — held-out docs
    * included, flagged so a caller can measure generalization — by
    * prior + Σ tf·(ln p(t|pos) − ln p(t|neg)). Inference-time OOV terms
    * drop via the inner join to the model, standard NB practice.
    *
    * Scale shape: the corpus tokenizes and shuffles raw tokens exactly
    * ONCE into per-doc term frequencies (the q84 cached-tf idiom); the
    * model is a second agg over already-grouped (term, tf) rows and
    * comes back by BROADCAST (a unigram vocab is MBs at any corpus
    * size); scoring is one more partial-agg shuffle of distinct
    * (doc, term) rows. Class totals and doc priors are 1-row broadcast
    * attaches (the q72 statistics idiom). Determinism: the 6-decimal
    * round absorbs float summation order (q54/q84 policy), and the
    * predicted label compares the ROUNDED score so both engines decide
    * ties identically. */
  def q114NbClassifier(spark: SparkSession, dir: String): DataFrame = {
    val curated = Seq("src0", "src1", "src2", "src3")
    val base = documents(spark, dir).select(
      col("doc_id"), col("text"),
      col("source").isin(curated: _*).cast("int").as("pos"),
      (col("doc_id") % 10 < 8).cast("int").as("is_train"))
    // cached: the model agg and the scoring agg both read the tf table —
    // tokenize and shuffle the corpus once (q84 idiom). Registered for
    // harness-side unpersist.
    val tf = graft.Caches.register(base
      .select(col("doc_id"), col("pos"), col("is_train"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("term"))
      .groupBy(col("doc_id"), col("pos"), col("is_train"), col("term"))
      .agg(count(lit(1)).as("tf")).cache())
    val model = tf.where(col("is_train") === 1)
      .groupBy(col("term"))
      .agg(sum(when(col("pos") === 1, col("tf")).otherwise(0L)).as("cpos"),
        sum(when(col("pos") === 0, col("tf")).otherwise(0L)).as("cneg"))
    val stats = model.agg(sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"),
      count(lit(1)).as("vocab"))
    val priors = base.where(col("is_train") === 1)
      .agg(sum(col("pos")).cast("long").as("dpos"),
        (count(lit(1)) - sum(col("pos"))).cast("long").as("dneg"))
    val w = col("tf").cast("double") *
      (log((col("cpos") + 1).cast("double") / (col("npos") + col("vocab")).cast("double")) -
        log((col("cneg") + 1).cast("double") / (col("nneg") + col("vocab")).cast("double")))
    val logOdds = round(col("sw") +
      log(col("dpos").cast("double") / col("dneg").cast("double")), 6)
    tf.join(broadcast(model), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"), col("pos"), col("is_train"))
      .agg(sum(w).as("sw"))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("pos").as("is_curated"), col("is_train"),
        logOdds.as("nb_log_odds"),
        (logOdds > 0).cast("int").as("pred_curated"))
      .orderBy(col("doc_id"))
  }

  val q114Sql: String =
    "WITH base AS (SELECT doc_id, text, " +
      "CASE WHEN source IN ('src0','src1','src2','src3') THEN 1 ELSE 0 END AS pos, " +
      "CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END AS is_train FROM documents), " +
      "tok AS (SELECT doc_id, pos, is_train, " +
      "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM base), " +
      "tf AS (SELECT doc_id, pos, is_train, term, count(*) AS tf FROM tok GROUP BY 1, 2, 3, 4), " +
      "model AS (SELECT term, " +
      "CAST(sum(CASE WHEN pos = 1 THEN tf ELSE 0 END) AS BIGINT) AS cpos, " +
      "CAST(sum(CASE WHEN pos = 0 THEN tf ELSE 0 END) AS BIGINT) AS cneg " +
      "FROM tf WHERE is_train = 1 GROUP BY term), " +
      "stats AS (SELECT CAST(sum(cpos) AS BIGINT) AS npos, " +
      "CAST(sum(cneg) AS BIGINT) AS nneg, count(*) AS vocab FROM model), " +
      "pri AS (SELECT CAST(sum(pos) AS BIGINT) AS dpos, " +
      "CAST(count(*) - sum(pos) AS BIGINT) AS dneg FROM base WHERE is_train = 1), " +
      "scored AS (SELECT doc_id, pos, is_train, " +
      "sum(tf * (ln(CAST(cpos + 1 AS DOUBLE) / (npos + vocab)) - " +
      "ln(CAST(cneg + 1 AS DOUBLE) / (nneg + vocab)))) AS sw " +
      "FROM tf JOIN model USING (term) CROSS JOIN stats GROUP BY 1, 2, 3) " +
      "SELECT doc_id, pos AS is_curated, is_train, " +
      "round(sw + ln(CAST(dpos AS DOUBLE) / dneg), 6) AS nb_log_odds, " +
      "CASE WHEN round(sw + ln(CAST(dpos AS DOUBLE) / dneg), 6) > 0 THEN 1 ELSE 0 END AS pred_curated " +
      "FROM scored CROSS JOIN pri ORDER BY doc_id"

  /** q122: collocation mining — top-50 adjacent-bigram PMI with minimum
    * support 5 (Church & Hanks 1990; the word2phrase step that feeds
    * multi-word entries into a tokenizer vocabulary). ADJACENT bigrams
    * only, never within-window pairs, so the explode is LINEAR in
    * corpus tokens (a window-pair variant is quadratic per window and
    * buys little for phrase mining). PMI = ln(P(a,b) / (P(a)·P(b)))
    * with bigram and unigram mass normalized separately.
    *
    * Scale shape: one cached token-array scan feeds the unigram count,
    * the bigram count, and the bigram-total stat; both count tables are
    * partial-agged; the unigram table joins back by BROADCAST (a
    * unigram vocab is MBs at any corpus size — the q84/q114 model
    * idiom); totals are 1-row broadcast attaches; the top-50 is
    * TakeOrdered on the ROUNDED pmi (round-6 before the sort so both
    * engines rank identically — the q112 policy), tie-broken (w1, w2). */
  def q122Collocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.Caches.register(documents(spark, dir)
      .select(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("ws"))
      .cache())
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = toks
      .where(size(col("ws")) >= 2)
      .select(posexplode_outer(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("w1"),
          element_at(col("ws"), i + 2).as("w2")))))
      .where(col("col").isNotNull)
      .select(col("col.w1").as("w1"), col("col.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      .where(col("cab") >= 5)
    val nuDf = uni.agg(sum(col("c")).as("nu"))
    val nbDf = toks.agg(sum(greatest(size(col("ws")) - 1, lit(0))).cast("long").as("nb"))
    val pmi = round(log(
      (col("cab").cast("double") / col("nb")) /
        ((col("ca").cast("double") / col("nu")) * (col("cb").cast("double") / col("nu")))), 6)
    bi
      .join(broadcast(uni.select(col("w").as("w1"), col("c").as("ca"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("cb"))), "w2")
      .crossJoin(broadcast(nuDf)).crossJoin(broadcast(nbDf))
      .select(col("w1"), col("w2"), col("cab"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(50)
  }

  val q122Sql: String =
    "WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents), " +
      "uni AS (SELECT w, count(*) AS c FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w), " +
      "nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM uni), " +
      "nb AS (SELECT CAST(sum(greatest(len(ws) - 1, 0)) AS BIGINT) AS nb FROM t), " +
      "bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2 FROM " +
      "(SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM t WHERE len(ws) >= 2)), " +
      "bi AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY 1, 2 HAVING count(*) >= 5) " +
      "SELECT w1, w2, cab, " +
      "round(ln((CAST(cab AS DOUBLE) / nb) / " +
      "((CAST(ca AS DOUBLE) / nu) * (CAST(cb AS DOUBLE) / nu))), 6) AS pmi " +
      "FROM bi JOIN (SELECT w AS w1, c AS ca FROM uni) USING (w1) " +
      "JOIN (SELECT w AS w2, c AS cb FROM uni) USING (w2) " +
      "CROSS JOIN nu CROSS JOIN nb " +
      "ORDER BY pmi DESC, w1, w2 LIMIT 50"

  /** q131: per-document token-entropy quality signal — Shannon entropy
    * of the document's unigram distribution, the information-density
    * gate (Gopher/C4-class filtering) that catches what q26's surface
    * ratios and q68's adjacent-repetition scan both miss: documents
    * cycling a tiny vocabulary look length- and punctuation-normal and
    * need not repeat ADJACENTLY, but their entropy collapses.
    * H = log2(n) − (Σ c·log2 c)/n computed algebraically from the term
    * frequencies (one pass, no per-token p·log p materialization);
    * `repetitive` flags H below 3.5 bits (the sf0.01 5th percentile;
    * uniform use of the corpus vocabulary would give ~log2(31) ≈ 4.95).
    *
    * Scale shape: one partial-agged shuffle to (doc, term) counts, one
    * cheap rollup to per-doc scalars — the q27/q54 tf idiom; nothing is
    * broadcast and nothing is quadratic. Determinism: the c·ln c sum is
    * a per-doc double reduction over ≤ |vocab| terms with magnitudes
    * ~1e2, so summation-order drift is ~1e-13 and the round-6 policy
    * absorbs it; the flag compares the ROUNDED entropy so both engines
    * flag identically. Docs with zero [a-z] tokens have no unigram
    * distribution and drop out (none exist at any tested SF). */
  def q131TokenEntropy(spark: SparkSession, dir: String): DataFrame = {
    val tf = documents(spark, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val n = col("n_tokens").cast("double")
    val entropy = round(
      (log(n) - col("slc") / n) / log(lit(2.0)), 6)
    tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(col("c").cast("double") * log(col("c").cast("double"))).as("slc"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        entropy.as("entropy"), (entropy < 3.5).cast("int").as("repetitive"))
      .orderBy(col("doc_id"))
  }

  val q131Sql: String =
    "WITH tf AS (SELECT doc_id, w, count(*) AS c FROM " +
      "(SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents) " +
      "GROUP BY 1, 2), " +
      "agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_distinct, " +
      "sum(c * ln(c)) AS slc FROM tf GROUP BY 1) " +
      "SELECT doc_id, n_tokens, n_distinct, " +
      "round((ln(CAST(n_tokens AS DOUBLE)) - slc / n_tokens) / ln(2), 6) AS entropy, " +
      "CAST(round((ln(CAST(n_tokens AS DOUBLE)) - slc / n_tokens) / ln(2), 6) < 3.5 AS INTEGER) AS repetitive " +
      "FROM agg ORDER BY doc_id"

  /** Number of BPE merge rules q132 learns. Fixed like q119's PrIters so
    * the oracle can unroll the same rounds as chained CTEs. */
  private val BpeMerges = 8
  /** Symbol separator inside a segmentation string: U+001F unit
    * separator, which cannot occur in [a-z]+ words or the '</w>' mark. */
  private val BpeSep = "\u001f"

  /** q132: BPE vocabulary learning (Sennrich et al. 2016) — the
    * tokenizer-TRAINING operator, upstream of everything q27's BPE-ish
    * token counter and q81/q82's packing assume: learn the top-K merge
    * rules from the corpus itself. Output = the ranked merge table
    * (rank, left/right symbol, merged symbol, the pair's corpus
    * frequency at selection time).
    *
    * The training loop runs on the WORD HISTOGRAM, not the corpus: the
    * one corpus-scale operation is the (word → count) aggregation (one
    * partial-agged shuffle — at 100 TB this is a q27-class token scan),
    * after which every round costs one pair-count shuffle and one
    * map-side re-segmentation over |vocab| rows — exactly how
    * production BPE trainers are structured, and why vocabulary
    * learning is tractable at any corpus size. Each round is
    * driver-coordinated like the q112/q98 fits: the argmax pair (count
    * DESC, then (a, b) lexicographic — binary collation in both
    * engines) is a 1-row TakeOrdered the driver reads, then broadcast
    * back as literals in the re-segmentation lambda.
    *
    * Segmentations are U+001F-joined strings, and a merge round is a
    * LEFT fold: acc ends-with the rule's left symbol as a COMPLETE
    * trailing segment and x is the right symbol → append x WITHOUT a
    * separator (the trailing segment becomes the merged symbol);
    * otherwise append with separator. Left-to-right non-overlap
    * ("aaa" + (a,a) → [aa, a]) falls out because the merged trailing
    * segment no longer equals the rule's left symbol. The DuckDB oracle
    * replays the identical fold with list_reduce and unrolls the
    * rounds as chained CTEs (the q119 pattern), so the whole training
    * run is hash-checked — argmaxes, tie-breaks, and segmentations.
    * Each round's ~|vocab|-row frame is lineage-truncated (q119: plan
    * flatness, not just recompute). */
  /** Runs the q132 training loop: returns the learned merge rules
    * (rank, left, right, merged, pair count) and the final per-word
    * segmentation frame (word, c, seg) after all [[BpeMerges]] rounds —
    * which IS the trained tokenizer's encoding of every corpus word, so
    * q133 can encode the whole corpus with a dictionary join instead of
    * re-running any per-document fold.
    *
    * Memoized per (session, corpus dir): a session computing BOTH q132
    * and q133 trains once — the second call costs only its own
    * dictionary join. The memo keeps ONE entry (evicting the previous
    * corpus's segmentation cache), and the kept segmentation is cached
    * OUTSIDE the Caches registry, because the harness drains that
    * between queries and the whole point is surviving into the next
    * query. Reuse after a drain is still cheap even for the memo's
    * dependencies: every round's frame is localCheckpoint-truncated, so
    * recomputation reads checkpoint blocks, not the training lineage. */
  private def bpeTrain(spark: SparkSession, dir: String): (Seq[(Int, String, String, String, Long)], DataFrame) =
    bpeMemoLock.synchronized {
      bpeMemo match {
        case Some((k, v)) if k == (spark, dir) => v
        case prev =>
          prev.foreach { case (_, (_, oldSeg)) =>
            try oldSeg.unpersist()
            catch { case scala.util.control.NonFatal(_) => () }
            // the evicted memo's segmentation is checkpoint-backed and
            // unregistered (it had to survive harness drains) — its
            // store frees here or never (r19)
            graft.dedup.Dedup.retireCheckpoint(oldSeg)
          }
          val v = bpeTrainImpl(spark, dir)
          v._2.cache()
          bpeMemo = Some(((spark, dir), v))
          v
      }
    }

  private val bpeMemoLock = new Object
  private var bpeMemo: Option[((SparkSession, String), (Seq[(Int, String, String, String, Long)], DataFrame))] = None

  private def bpeTrainImpl(spark: SparkSession, dir: String): (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val words = graft.Caches.register(documents(spark, dir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .cache())
    var seg = words.select(col("word"), col("c"),
      concat_ws(BpeSep, concat(split(col("word"), ""), array(lit("</w>")))).as("seg"))
    val rules = Seq.newBuilder[(Int, String, String, String, Long)]
    // the round before the one `best` just materialized — fully consumed
    // (its checkpoint was read to materialize the current round) and
    // retired per round (r19)
    var prevSeg: DataFrame = null
    for (r <- 1 to BpeMerges) {
      val arr = split(col("seg"), BpeSep)
      val best = seg
        .filter(size(arr) >= 2)
        .select(col("c"), explode(arrays_zip(
          slice(arr, lit(1), size(arr) - 1).as("a"),
          slice(arr, lit(2), size(arr) - 1).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).head()
      if (prevSeg ne null) graft.dedup.Dedup.retireCheckpoint(prevSeg)
      prevSeg = seg
      val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      rules += ((r, a, b, a + b, cnt))
      val fold = aggregate(
        slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        element_at(arr, 1),
        (acc, x) => when(
          (acc === a || acc.endsWith(lit(BpeSep + a))) && x === lit(b),
          concat(acc, x)).otherwise(concat(acc, lit(BpeSep), x)))
      // checkpoint-only persistence (r18): the cache + checkpoint pair
      // double-stored every BPE round's segment table. The FINAL round
      // is the memo's cross-query segmentation and the SECOND-TO-LAST
      // is its materialization parent (the final frame is lazy until a
      // q133-style reader runs, possibly after a harness drain) — both
      // stay OFF the drain registry (r19); the final frame frees on
      // memo eviction, its parent via ContextCleaner once the final
      // materializes and truncates away from it.
      seg = graft.dedup.Dedup.truncateLineage(
        seg.select(col("word"), col("c"), fold.as("seg")),
        register = r < BpeMerges - 1)
    }
    (rules.result(), seg)
  }

  def q132BpeVocab(spark: SparkSession, dir: String): DataFrame = {
    val (rules, _) = bpeTrain(spark, dir)
    val spark2 = spark
    import spark2.implicits._
    rules.toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** q133: BPE corpus encoding — apply the q132-trained tokenizer to
    * every document and emit the token-accounting row a training
    * pipeline budgets with: word count, BPE token count, and the
    * chars-per-token compression the learned vocabulary achieves.
    * This is the REAL token counter that q27's regex heuristic
    * approximates, and the unit q81/q82's packing budget is
    * denominated in.
    *
    * Scale shape: training already produced the final segmentation of
    * every DISTINCT word, so encoding is a dictionary join — explode
    * the corpus to (doc, word) (the q27-class token scan), join the
    * broadcast-sized (word → symbol count) dictionary, one partial-
    * agged rollup per doc. No per-document fold ever runs: the
    * tokenizer is applied to the vocabulary once, exactly how
    * production pipelines amortize encoding. Determinism: counts are
    * exact ints; compression is one rounded division of small ints. */
  def q133BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (_, seg) = bpeTrain(spark, dir)
    val sym = seg.select(col("word"),
      size(split(col("seg"), BpeSep)).cast("long").as("n_sym"),
      length(col("word")).cast("long").as("n_chr"))
    documents(spark, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .join(sym, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"),
        sum(col("n_chr")).as("n_alpha_chars"))
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_alpha_chars").cast("double") / col("n_bpe_tokens").cast("double"), 6)
          .as("chars_per_token"))
      .orderBy(col("doc_id"))
  }

  /** The q132 training chain as DuckDB CTEs (words → seg0 → one
    * (pair-count, argmax, refold) triple per round), shared by the
    * q132 and q133 oracles so the two replay the identical trainer. */
  private val BpeCtes: String = {
    val sep = "chr(31)"
    val base =
      "WITH words AS (SELECT w AS word, count(*) AS c FROM " +
        "(SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents) " +
        "GROUP BY 1), " +
        s"seg0 AS (SELECT word, c, array_to_string(string_split(word, ''), $sep) || " +
        s"$sep || '</w>' AS seg FROM words), "
    val rounds = (1 to BpeMerges).map { r =>
      val p = s"seg${r - 1}"
      s"p$r AS (SELECT (pr).a AS a, (pr).b AS b, CAST(sum(c) AS BIGINT) AS cnt FROM " +
        "(SELECT c, unnest(list_transform(range(1, length(l)), i -> {'a': l[i], 'b': l[i+1]})) AS pr " +
        s"FROM (SELECT c, string_split(seg, $sep) AS l FROM $p)) GROUP BY 1, 2), " +
        s"b$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1), " +
        s"seg$r AS (SELECT word, c, list_reduce(string_split(seg, $sep), (acc, x) -> " +
        s"CASE WHEN (acc = b$r.a OR right(acc, length(b$r.a) + 1) = $sep || b$r.a) " +
        s"AND x = b$r.b THEN acc || x ELSE acc || $sep || x END) AS seg " +
        s"FROM $p, b$r)"
    }.mkString(", ")
    base + rounds
  }

  val q132Sql: String =
    BpeCtes + " " +
      (1 to BpeMerges).map(r =>
        s"SELECT $r AS merge_rank, a AS left_sym, b AS right_sym, " +
          s"a || b AS merged, cnt AS pair_count FROM b$r").mkString(" UNION ALL ") +
      " ORDER BY merge_rank"

  val q133Sql: String =
    BpeCtes +
      s", sym AS (SELECT word, len(string_split(seg, chr(31))) AS n_sym, " +
      s"length(word) AS n_chr FROM seg$BpeMerges), " +
      "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word " +
      "FROM documents) " +
      "SELECT doc_id, count(*) AS n_words, CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens, " +
      "round(CAST(sum(n_chr) AS DOUBLE) / sum(n_sym), 6) AS chars_per_token " +
      "FROM tok JOIN sym USING (word) GROUP BY doc_id ORDER BY doc_id"

  /** Hashed-feature bucket count for q134. 256 buckets keeps the model
    * table broadcast-trivial while leaving bucket collisions rare on the
    * synthetic vocabulary; production DSIR uses 10k-100k buckets — the
    * plan shape is identical, only this literal changes. */
  private val DsirBuckets = 256
  /** The "curated target" allowlist for q134 — the q114 idea (a fixed
    * source allowlist standing in for "looks like Wikipedia") restricted
    * to English, so the target distribution differs measurably from the
    * raw corpus mix. */
  private val DsirTargetSources = Seq("src0", "src1", "src2", "src3")

  /** q134: DSIR importance weighting + selection (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling") — the
    * distribution-MATCHING selector the heuristic gates can't express:
    * score every document by how much more likely its hashed-unigram
    * features are under a curated TARGET distribution than under the raw
    * corpus, then keep the top-N. Complements q114 (a discriminative
    * classifier needing labels) with the generative importance-ratio
    * form, and q103/q58 (weight/strata given) by COMPUTING the weights.
    *
    * Both distributions are add-one-smoothed multinomials over
    * [[DsirBuckets]] hashed unigram buckets (hashing is what makes the
    * model size corpus-independent — the DSIR trick); the per-doc weight
    * is sum_b f_b * (ln p_target(b) - ln p_raw(b)) over the doc's
    * bucket counts. Selection is the top-100 by 6-decimal-rounded weight,
    * ties by doc_id (q101 ranking policy; the <=256 addends per doc keep
    * summation-order drift at ~1e-12, absorbed by the round).
    *
    * Scale shape: ONE corpus token scan + one partial-agged shuffle to
    * (doc, bucket) counts (cached — target/raw bucket totals and the
    * per-doc scoring all derive from it); the bucket model is <=256 rows
    * regardless of corpus size, so it joins back by BROADCAST and the
    * selection is a TakeOrdered — no second corpus shuffle anywhere.
    * Bucket hash = md5-hex-prefix (the q57/q103 idiom) so DuckDB replays
    * it bit-for-bit. */
  def q134DsirSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(concat(col("term"), lit("|graft-dsir-1"))), 1, 8), 16, 10)
        .cast("long"), lit(DsirBuckets))
    val fb = graft.Caches.register(documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("term"))
      .select(col("doc_id"), col("lang"), col("source"), bucket.as("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"), col("b"))
      .agg(count(lit(1)).as("f"))
      .cache())
    val corpus = fb.groupBy(col("b")).agg(sum(col("f")).as("cf"))
    val target = fb
      .where(col("lang") === "en" && col("source").isin(DsirTargetSources: _*))
      .groupBy(col("b")).agg(sum(col("f")).as("tf"))
    // corpus-side LEFT join: every observed bucket has cf > 0, but the
    // target may never hit a bucket — smoothing still scores it
    val model = corpus.join(target, Seq("b"), "left")
      .select(col("b"), col("cf"), coalesce(col("tf"), lit(0L)).as("tf"))
    val totals = model.agg(sum(col("cf")).as("ct"), sum(col("tf")).as("tt"))
    val lr = log((col("tf") + 1).cast("double") / (col("tt") + DsirBuckets).cast("double")) -
      log((col("cf") + 1).cast("double") / (col("ct") + DsirBuckets).cast("double"))
    fb.join(broadcast(model.crossJoin(broadcast(totals)).select(col("b"), lr.as("lr"))), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("f")).as("n_tokens"),
        round(sum(col("f").cast("double") * col("lr")), 6).as("dsir_weight"))
      .orderBy(col("dsir_weight").desc, col("doc_id"))
      .limit(100)
  }

  val q134Sql: String = {
    val srcs = DsirTargetSources.map(s => s"'$s'").mkString(", ")
    "WITH tok AS (SELECT doc_id, lang, source, " +
      "unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term FROM documents), " +
      "fb AS (SELECT doc_id, lang, source, " +
      s"CAST('0x' || substr(md5(term || '|graft-dsir-1'), 1, 8) AS BIGINT) % $DsirBuckets AS b, " +
      "count(*) AS f FROM tok GROUP BY 1, 2, 3, 4), " +
      "corpus AS (SELECT b, CAST(sum(f) AS BIGINT) AS cf FROM fb GROUP BY 1), " +
      s"target AS (SELECT b, CAST(sum(f) AS BIGINT) AS tf FROM fb WHERE lang = 'en' AND source IN ($srcs) GROUP BY 1), " +
      "model AS (SELECT b, cf, coalesce(tf, 0) AS tf FROM corpus LEFT JOIN target USING (b)), " +
      "tot AS (SELECT CAST(sum(cf) AS BIGINT) AS ct, CAST(sum(tf) AS BIGINT) AS tt FROM model), " +
      s"lr AS (SELECT b, ln(CAST(tf + 1 AS DOUBLE) / (tt + $DsirBuckets)) - " +
      s"ln(CAST(cf + 1 AS DOUBLE) / (ct + $DsirBuckets)) AS lr FROM model CROSS JOIN tot) " +
      "SELECT doc_id, CAST(sum(f) AS BIGINT) AS n_tokens, " +
      "round(sum(f * lr), 6) AS dsir_weight " +
      "FROM fb JOIN lr USING (b) GROUP BY doc_id " +
      "ORDER BY dsir_weight DESC, doc_id LIMIT 100"
  }

  /** q135: Gopher-style rule-bitmap quality gate (Rae et al. 2021, the
    * word-LEVEL document filters every pretraining pipeline runs;
    * thresholds adapted to the synthetic corpus). Where q26 emits one
    * blended score, this emits each named rule as its own flag PLUS the
    * composite keep — the form a curation dashboard and an ablation
    * study both need (which rule fired, not just "rejected").
    *
    * Rules (all from one per-doc word-frequency aggregation):
    *   r_wordcount  — total words in [20, 200] (too short to learn from /
    *                  suspicious runaway)
    *   r_meanlen    — mean word length in [2, 8] (gibberish detector)
    *   r_stopwords  — contains >=2 distinct function words (Gopher's
    *                  "stop word containment"; the synthetic vocabulary
    *                  carries 'the' and 'a')
    *   r_ttr        — type/token ratio >= 0.2 (low = a cycler q68's
    *                  adjacent-repetition test can miss)
    *   r_dominance  — most frequent word <= 20% of the doc (single-token
    *                  spam)
    *
    * Determinism: every ratio is ONE IEEE division of exact ints —
    * correctly rounded, hence bit-identical cross-engine — compared to
    * shared literals; display columns round for the q54 policy, flags
    * compare the unrounded division. Scale shape: one partial-agged
    * shuffle to (doc, word) counts, one to the per-doc profile; no
    * model, no join — a pure map-reduce gate that runs at any corpus
    * size. */
  def q135GopherRules(spark: SparkSession, dir: String): DataFrame = {
    val tf = documents(spark, dir)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val prof = tf.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("max_c"),
      sum(col("c") * length(col("w"))).as("sum_len"),
      sum(when(col("w").isin("the", "a"), 1L).otherwise(0L)).as("n_stop"))
    val nw = col("n_words").cast("double")
    val mwl = col("sum_len").cast("double") / nw
    val ttr = col("n_distinct").cast("double") / nw
    val dom = col("max_c").cast("double") / nw
    val rules = Seq(
      (col("n_words") >= 20 && col("n_words") <= 200) -> "r_wordcount",
      (mwl >= 2.0 && mwl <= 8.0) -> "r_meanlen",
      (col("n_stop") >= 2) -> "r_stopwords",
      (ttr >= 0.2) -> "r_ttr",
      (dom <= 0.2) -> "r_dominance")
    prof.select(
      Seq(col("doc_id"), col("n_words"), col("n_distinct"),
        round(mwl, 6).as("mean_wlen")) ++
        rules.map { case (c, n) => c.cast("int").as(n) } :+
        rules.map(_._1).reduce(_ && _).cast("int").as("keep"): _*)
      .orderBy(col("doc_id"))
  }

  val q135Sql: String =
    "WITH tf AS (SELECT doc_id, w, count(*) AS c FROM " +
      "(SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents) " +
      "GROUP BY 1, 2), " +
      "prof AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, count(*) AS n_distinct, " +
      "CAST(max(c) AS BIGINT) AS max_c, CAST(sum(c * length(w)) AS BIGINT) AS sum_len, " +
      "CAST(sum(CASE WHEN w IN ('the', 'a') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop " +
      "FROM tf GROUP BY 1) " +
      "SELECT doc_id, n_words, n_distinct, " +
      "round(CAST(sum_len AS DOUBLE) / n_words, 6) AS mean_wlen, " +
      "CAST(n_words BETWEEN 20 AND 200 AS INTEGER) AS r_wordcount, " +
      "CAST(CAST(sum_len AS DOUBLE) / n_words BETWEEN 2.0 AND 8.0 AS INTEGER) AS r_meanlen, " +
      "CAST(n_stop >= 2 AS INTEGER) AS r_stopwords, " +
      "CAST(CAST(n_distinct AS DOUBLE) / n_words >= 0.2 AS INTEGER) AS r_ttr, " +
      "CAST(CAST(max_c AS DOUBLE) / n_words <= 0.2 AS INTEGER) AS r_dominance, " +
      "CAST(n_words BETWEEN 20 AND 200 " +
      "AND CAST(sum_len AS DOUBLE) / n_words BETWEEN 2.0 AND 8.0 " +
      "AND n_stop >= 2 " +
      "AND CAST(n_distinct AS DOUBLE) / n_words >= 0.2 " +
      "AND CAST(max_c AS DOUBLE) / n_words <= 0.2 AS INTEGER) AS keep " +
      "FROM prof ORDER BY doc_id"

  /** q136: interpolated bigram-LM cross-entropy (Jelinek–Mercer
    * smoothing, the order-1 upgrade of q84's unigram gate): score each
    * document by its mean negative log-likelihood under
    * P(w|v) = 0.7·P_bigram(w|v) + 0.3·P_unigram(w), both components
    * add-one smoothed. Conditioning on context catches scrambled /
    * machine-garbled text that unigram frequencies alone cannot (the
    * tokens are fine, the ORDER is wrong) — the actual KenLM filter is
    * an order-5 version of exactly this dataflow.
    *
    * Plan shape: the corpus tokenizes ONCE into a cached per-doc token
    * array; bigrams explode MAP-SIDE from the array (the q132 pair
    * idiom — slice+arrays_zip, no window, so there is no per-doc
    * exchange before the count shuffle). One partial-agged shuffle to
    * per-doc distinct-bigram multiplicities (cached — the corpus bigram
    * model derives FROM it, so raw pairs shuffle exactly once); bigram /
    * context / unigram models and totals all join back by BROADCAST (a
    * text bigram vocabulary is heavy-tailed — production prunes by a
    * count floor; if it ever outgrew broadcast the join key is (a,b),
    * the same shuffle the count already took). Scoring sums m·ln P over
    * DISTINCT bigrams (q84's distinct-terms trick); the 6-decimal round
    * absorbs summation-order ulps (q54 policy). Docs with <2 alpha
    * tokens have no bigram distribution and drop out (none at any
    * tested SF). */
  def q136BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val arr = regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))
    val docsArr = graft.Caches.register(
      documents(spark, dir).select(col("doc_id"), arr.as("w")).cache())
    val w = col("w")
    val m = graft.Caches.register(docsArr
      .filter(size(w) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(w, lit(1), size(w) - 1).as("a"),
        slice(w, lit(2), size(w) - 1).as("b"))).as("p"))
      .groupBy(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("m"))
      .cache())
    val c2 = m.groupBy(col("a"), col("b")).agg(sum(col("m")).as("c2"))
    val c1 = c2.groupBy(col("a")).agg(sum(col("c2")).as("c1"))
    val uni = docsArr.select(explode(w).as("b")).groupBy(col("b")).agg(count(lit(1)).as("cf"))
    val tot = uni.agg(sum(col("cf")).as("n_corpus"), count(lit(1)).as("vocab"))
    val p2 = (col("c2") + 1).cast("double") / (col("c1") + col("vocab")).cast("double")
    val p1 = (col("cf") + 1).cast("double") / (col("n_corpus") + col("vocab")).cast("double")
    m.join(broadcast(c2), Seq("a", "b"))
      .join(broadcast(c1), Seq("a"))
      .join(broadcast(uni), Seq("b"))
      .crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_bigrams"),
        round(-sum(col("m").cast("double") * log(lit(0.7) * p2 + lit(0.3) * p1)) /
          sum(col("m")), 6).as("cross_entropy2"))
      .orderBy(col("doc_id"))
  }

  val q136Sql: String =
    "WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS w FROM documents), " +
      "big AS (SELECT doc_id, (pr).a AS a, (pr).b AS b FROM " +
      "(SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> {'a': w[i], 'b': w[i+1]})) AS pr " +
      "FROM d WHERE len(w) >= 2)), " +
      "m AS (SELECT doc_id, a, b, count(*) AS m FROM big GROUP BY 1, 2, 3), " +
      "c2 AS (SELECT a, b, CAST(sum(m) AS BIGINT) AS c2 FROM m GROUP BY 1, 2), " +
      "c1 AS (SELECT a, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1), " +
      "uni AS (SELECT b, count(*) AS cf FROM (SELECT unnest(w) AS b FROM d) GROUP BY 1), " +
      "tot AS (SELECT CAST(sum(cf) AS BIGINT) AS n_corpus, count(*) AS vocab FROM uni) " +
      "SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams, " +
      "round(-sum(m * ln(0.7 * (CAST(c2 + 1 AS DOUBLE) / (c1 + vocab)) + " +
      "0.3 * (CAST(cf + 1 AS DOUBLE) / (n_corpus + vocab)))) / sum(m), 6) AS cross_entropy2 " +
      "FROM m JOIN c2 USING (a, b) JOIN c1 USING (a) JOIN uni USING (b) CROSS JOIN tot " +
      "GROUP BY doc_id ORDER BY doc_id"

  /** q140: grouped top-k WITHOUT a window sort — per language, the top-20
    * documents by the shared q26 quality score, computed with the
    * [[graft.functions.TopK]] bounded-buffer Aggregator. The point is the
    * PLAN, not the answer: `row_number() OVER (PARTITION BY lang ...)`
    * shuffles and sorts every row of every group, while the aggregator
    * runs as a partial+final aggregate — each map task reduces to at
    * most k survivors per group BEFORE the exchange, so the shuffle
    * moves O(k·|langs|·partitions) bounded buffers instead of the corpus
    * (TakeOrdered economics, per group). The oracle states the same
    * top-k as the window form — proving the two agree row-for-row —
    * and PlanQualitySpec pins that the aggregator plan contains no
    * Window and no corpus Sort. Score is ROUNDED before aggregation so
    * the ordering (score DESC, doc_id ASC) is cross-engine exact. */
  def q140GroupedTopk(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK(20))
    documents(spark, dir)
      .select(col("lang"), col("doc_id"), round(qualityScoreCol, 6).as("q"))
      .groupBy(col("lang"))
      .agg(topk(col("q"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"), col("col.score").as("quality"))
      .orderBy(col("lang"), col("rk"))
  }

  val q140Sql: String =
    s"SELECT lang, rk, doc_id, quality FROM (" +
      "SELECT lang, doc_id, q AS quality, " +
      "ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rk " +
      s"FROM (SELECT lang, doc_id, round($qualityScoreSql, 6) AS q FROM documents)) " +
      "WHERE rk <= 20 ORDER BY lang, rk"

  /** q153: Zipf profile — the corpus-statistics fingerprint (token
    * count, vocabulary size, and the log-log slope + R² of the top-1000
    * frequency spectrum). Natural text sits near slope −1 (Zipf's law);
    * machine-generated/templated corpora flatten or step, so the slope
    * is the cheapest whole-corpus "does this look like language" gate,
    * complementing the per-document gates (q26/q131/q135) and the
    * heavy-hitter views (q96/q142). Plan: the one corpus token shuffle
    * every text op pays, a TakeOrdered(1000) spectrum head, a
    * single-partition rank window over those 1000 rows (tiny by
    * construction), and one co-moment aggregate; totals attach as a
    * 1-row broadcast. ln over exact integer counts is the q84/q121
    * cross-engine-stable class; the regression is round-6 (q106
    * policy). */
  def q153ZipfProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = graft.Caches.register(documents(spark, dir)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
      .cache())
    val totals = tf.agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_vocab"))
    val top = tf.orderBy(col("c").desc, col("word").asc).limit(1000)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c").desc, col("word").asc)))
    top
      .agg(
        round(regr_slope(log(col("c").cast("double")), log(col("rn").cast("double"))), 6).as("zipf_slope"),
        round(regr_r2(log(col("c").cast("double")), log(col("rn").cast("double"))), 6).as("zipf_r2"))
      .crossJoin(broadcast(totals))
      .select(col("n_tokens"), col("n_vocab"), col("zipf_slope"), col("zipf_r2"))
  }

  val q153Sql: String =
    "WITH tf AS (SELECT word, count(*) AS c FROM " +
      "(SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word FROM documents) " +
      "GROUP BY word), " +
      "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS n_vocab FROM tf), " +
      "top AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rn " +
      "FROM tf ORDER BY c DESC, word LIMIT 1000) " +
      "SELECT n_tokens, n_vocab, " +
      "round(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rn AS DOUBLE))), 6) AS zipf_slope, " +
      "round(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rn AS DOUBLE))), 6) AS zipf_r2 " +
      "FROM top CROSS JOIN tot GROUP BY n_tokens, n_vocab"

  /** q233: PERSISTED INVERTED TEXT INDEX (r17, [[TextIndex]] — the
    * lexical twin of the q227/q228 ANN index): the corpus is indexed
    * ONCE into bucket-partitioned BM25 postings
    * (`CALL create_text_index`), then `CALL text_search` answers q101's
    * exact query from the postings alone — tokenization paid at write
    * time, the scan pruned to the query terms' hash buckets. The
    * oracle is q101's VERBATIM: hash-green means the persisted index
    * and the from-scratch corpus pass are byte-identical. */
  def q233TextIndex(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q233")
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/docs`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) USING `graft-jsondoc`")
    documents(spark, dir).select(col("doc_id"), col("text")).writeTo(tbl).append()
    spark.sql(s"CALL graftcat.create_text_index('$root/idx', '$root/docs', 64)")
      .collect()
    spark.sql(s"CALL graftcat.text_search('$root/idx', 'hash,join,vector', 10)")
  }

  /** q234: TEXT INDEX MAINTENANCE FROM THE CHANGE FEED (r17,
    * [[TextIndex.refresh]]): the index is created over a PARTIAL
    * corpus, then the base takes an append, a text-mutating UPDATE
    * (tf and doc length change), and a DELETE — and one
    * `CALL refresh_text_index` folds all three commits from the feed
    * (tombstones re-tokenized from the feed's before-images; the index
    * itself is never diff-scanned). The oracle recomputes BM25 over
    * the final corpus from scratch — hash-green proves the folded
    * postings equal a full rebuild. */
  def q234TextIndexDml(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q234")
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/docs`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val docs = documents(spark, dir).select(col("doc_id"), col("text"))
    docs.filter(pmod(col("doc_id"), lit(4)) =!= 3).writeTo(tbl).append() // v1
    spark.sql(s"CALL graftcat.create_text_index('$root/idx', '$root/docs', 64)")
      .collect()
    docs.filter(pmod(col("doc_id"), lit(4)) === 3).writeTo(tbl).append() // v2
    spark.sql(s"UPDATE $tbl SET text = concat(text, ' vector vector') " +
      "WHERE doc_id % 10 = 4") // v3
    spark.sql(s"DELETE FROM $tbl WHERE doc_id % 10 = 6") // v4
    spark.sql(s"CALL graftcat.refresh_text_index('$root/idx')").collect()
    spark.sql(s"CALL graftcat.text_search('$root/idx', 'hash,join,vector', 10)")
  }

  val q234Sql: String =
    "WITH docs AS (SELECT doc_id, CASE WHEN doc_id % 10 = 4 " +
      "THEN text || ' vector vector' ELSE text END AS text " +
      "FROM documents WHERE doc_id % 10 <> 6), " +
      "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs), " +
      "lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('hash','join','vector') GROUP BY 1, 2), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
      "stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens) " +
      "SELECT doc_id, round(sum(" +
      "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) * " +
      "(CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))" +
      "), 6) AS bm25 " +
      "FROM tf JOIN df USING (term) JOIN lens USING (doc_id) CROSS JOIN stats " +
      "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"

  /** Shared staging for q242/q243: the q234 DML lineage verbatim —
    * partial corpus indexed, then an append, a text-mutating UPDATE
    * and a DELETE folded through one refresh — so the searches run
    * over postings (and positions) maintained through real DML. */
  private def stagedDmlIndex(spark: SparkSession, dir: String,
      root: String): String = {
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val tbl = s"graftcat.`$root/docs`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val docs = documents(spark, dir).select(col("doc_id"), col("text"))
    docs.filter(pmod(col("doc_id"), lit(4)) =!= 3).writeTo(tbl).append() // v1
    spark.sql(s"CALL graftcat.create_text_index('$root/idx', '$root/docs', 64)")
      .collect()
    docs.filter(pmod(col("doc_id"), lit(4)) === 3).writeTo(tbl).append() // v2
    spark.sql(s"UPDATE $tbl SET text = concat(text, ' vector vector') " +
      "WHERE doc_id % 10 = 4") // v3
    spark.sql(s"DELETE FROM $tbl WHERE doc_id % 10 = 6") // v4
    spark.sql(s"CALL graftcat.refresh_text_index('$root/idx')").collect()
    s"$root/idx"
  }

  /** q242: CONJUNCTIVE (AND) SEARCH over the persisted text index
    * (r18, [[TextIndex.searchAnd]]): only documents containing EVERY
    * query term score — the doc sets intersect across the terms'
    * bucket-pruned postings BEFORE scoring, with corpus-wide df (a
    * restriction must not change a term's rarity). Runs over the q234
    * DML-maintained index; the oracle recomputes from the final
    * corpus with a HAVING-all-terms gate. */
  def q242TextSearchAnd(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q242")
    val idx = stagedDmlIndex(spark, dir, root)
    spark.sql(s"CALL graftcat.text_search_and('$idx', 'hash,join,vector', 10)")
  }

  val q242Sql: String =
    "WITH docs AS (SELECT doc_id, CASE WHEN doc_id % 10 = 4 " +
      "THEN text || ' vector vector' ELSE text END AS text " +
      "FROM documents WHERE doc_id % 10 <> 6), " +
      "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs), " +
      "lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('hash','join','vector') GROUP BY 1, 2), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
      "conj AS (SELECT doc_id FROM tf GROUP BY doc_id HAVING count(DISTINCT term) = 3), " +
      "stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens) " +
      "SELECT doc_id, round(sum(" +
      "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) * " +
      "(CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))" +
      "), 6) AS bm25 " +
      "FROM tf JOIN conj USING (doc_id) JOIN df USING (term) JOIN lens USING (doc_id) CROSS JOIN stats " +
      "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"

  /** q243: PHRASE SEARCH over the positional postings (r18,
    * [[TextIndex.searchPhrase]]): documents containing the terms
    * ADJACENT and in order — term i's stored positions shift by −i and
    * the phrase occurs iff the shifted sets intersect, an index-only
    * check over bucket-pruned postings (no text re-scan). Runs over
    * the q234 DML-maintained index, so the positions themselves
    * survived an update/delete/append fold; the oracle gates the
    * recompute on the token-adjacency regex (`hash` then `join`
    * separated only by non-token characters), the exact text-side
    * equivalent of positional adjacency. */
  def q243TextSearchPhrase(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q243")
    val idx = stagedDmlIndex(spark, dir, root)
    spark.sql(s"CALL graftcat.text_search_phrase('$idx', 'hash,join', 10)")
  }

  val q243Sql: String =
    "WITH docs AS (SELECT doc_id, CASE WHEN doc_id % 10 = 4 " +
      "THEN text || ' vector vector' ELSE text END AS text " +
      "FROM documents WHERE doc_id % 10 <> 6), " +
      "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM docs), " +
      "lens AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok WHERE term IN ('hash','join') GROUP BY 1, 2), " +
      "df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), " +
      "phrase AS (SELECT doc_id FROM docs WHERE " +
      "regexp_matches(lower(text), '(^|[^a-z0-9])hash[^a-z0-9]+join([^a-z0-9]|$)')), " +
      "stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens) " +
      "SELECT doc_id, round(sum(" +
      "ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) * " +
      "(CAST(tf AS DOUBLE) * 2.2 / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))" +
      "), 6) AS bm25 " +
      "FROM tf JOIN phrase USING (doc_id) JOIN df USING (term) JOIN lens USING (doc_id) CROSS JOIN stats " +
      "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"

  /** q244: TRANSPARENT TEXT-INDEX REWRITE (r18,
    * [[graft.plans.RewriteOntoTextIndex]] — the MV-rewrite move applied
    * to retrieval): the user writes q101's BM25 dataflow against the
    * BASE table — tokenize, lens, tf, df, stats — and the rule
    * reconstructs the (doc_id, term) occurrence rows from the CURRENT
    * persisted postings (`explode(array_repeat(term, tf))`), so the
    * corpus text is never scanned and tokenization is never re-paid.
    * In-flow require: the analyzed plan reads postings and NEVER the
    * base. Oracle: q101's from-scratch SQL — hash-green proves the
    * substitution is invisible in the answers. */
  def q244TextIndexRewrite(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q244")
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val basePath = new java.io.File(s"$root/docs").getAbsolutePath
    val tbl = s"graftcat.`$basePath`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) USING `graft-jsondoc`")
    documents(spark, dir).select(col("doc_id"), col("text")).writeTo(tbl).append()
    spark.sql(s"CALL graftcat.create_text_index('$root/idx', '$basePath', 64)")
      .collect()
    // the q101 dataflow VERBATIM, against the table
    val qTerms = Seq("hash", "join", "vector")
    val toks = spark.sql(s"SELECT doc_id, text FROM $tbl")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val w = col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    val out = tf.join(broadcast(dfq), "term").join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id")).agg(round(sum(idf * w), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    val scanned = out.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        graft.sources.GraftMv.unpinnedTablePath(r.table)
    }.flatten
    require(scanned.exists(_.endsWith("/postings")) && !scanned.contains(basePath),
      s"q244: the BM25 dataflow must be answered from the postings, got $scanned")
    out
  }

  /** q249: STALE text-index serving (r18b,
    * [[graft.plans.RewriteOntoTextIndex]] — the MV stale contract
    * applied to retrieval): the q101 dataflow runs against a base that
    * took an append, a text-mutating UPDATE and a DELETE since the
    * index last folded — and the rewrite still serves, reconstructing
    * occurrences as postings-pinned-at-version for untouched docs plus
    * the feed's final texts tokenized for the touched ones, O(delta)
    * at query time. In-flow require: the plan reads postings + the
    * change feed, NEVER the base table. Oracle: the q234 recompute
    * over the final corpus — hash-green proves stale serving is
    * invisible in the answers. */
  def q249TextStaleServe(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.RunTag.scratchFresh("q249")
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val basePath = new java.io.File(s"$root/docs").getAbsolutePath
    val tbl = s"graftcat.`$basePath`"
    spark.sql(s"CREATE TABLE $tbl (doc_id BIGINT, text STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val docs = documents(spark, dir).select(col("doc_id"), col("text"))
    docs.filter(pmod(col("doc_id"), lit(4)) =!= 3).writeTo(tbl).append() // v1
    spark.sql(s"CALL graftcat.create_text_index('$root/idx', '$basePath', 64)")
      .collect()
    // the q234 DML lineage lands UNFOLDED — the index stays at v1
    docs.filter(pmod(col("doc_id"), lit(4)) === 3).writeTo(tbl).append() // v2
    spark.sql(s"UPDATE $tbl SET text = concat(text, ' vector vector') " +
      "WHERE doc_id % 10 = 4") // v3
    spark.sql(s"DELETE FROM $tbl WHERE doc_id % 10 = 6") // v4
    val qTerms = Seq("hash", "join", "vector")
    val toks = spark.sql(s"SELECT doc_id, text FROM $tbl")
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .as("term"))
    val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val w = col("tf").cast("double") * lit(2.2) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl))
    val out = tf.join(broadcast(dfq), "term").join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id")).agg(round(sum(idf * w), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(10)
    var postings = false; var feed = false; var base = false
    out.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        graft.sources.GraftMv.unpinnedTablePath(r.table) match {
          case Some(p) if p == basePath => base = true
          case _ =>
            if (r.table.name().contains("/postings")) postings = true
            else if (r.table.getClass.getSimpleName.contains("Changes"))
              feed = true
        }
      case _ =>
    }
    require(postings && feed && !base,
      s"q249: stale serving must read postings + the change feed, never the " +
        s"base (postings=$postings feed=$feed base=$base)")
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q244_text_index_rewrite" -> q244TextIndexRewrite _,
    "q249_text_stale_serve" -> q249TextStaleServe _,
    "q233_text_index" -> q233TextIndex _,
    "q234_text_index_dml" -> q234TextIndexDml _,
    "q242_text_search_and" -> q242TextSearchAnd _,
    "q243_text_search_phrase" -> q243TextSearchPhrase _,
    "q153_zipf_profile" -> q153ZipfProfile _,
    "q140_grouped_topk" -> q140GroupedTopk _,
    "q136_bigram_lm" -> q136BigramLm _,
    "q134_dsir_sample" -> q134DsirSample _,
    "q135_gopher_rules" -> q135GopherRules _,
    "q156_ccnet_split" -> q156CcnetSplit _,
    "q131_token_entropy" -> q131TokenEntropy _,
    "q132_bpe_vocab" -> q132BpeVocab _,
    "q133_bpe_encode" -> q133BpeEncode _,
    "q101_bm25_topk" -> q101Bm25Topk _,
    "q122_collocations" -> q122Collocations _,
    "q114_nb_classifier" -> q114NbClassifier _,
    "q25_lang_id" -> q25LangId _,
    "q26_text_quality" -> q26Quality _,
    "q27_token_stats" -> q27TokenStats _,
    "q28_fingerprint" -> q28Fingerprint _,
    "q54_tfidf" -> q54Tfidf _,
    "q66_pii_scrub" -> q66PiiScrub _,
    "q68_repetition" -> q68Repetition _,
    "q69_decontaminate" -> q69Decontaminate _,
    "q84_unigram_lm" -> q84UnigramLm _
  )

  val oracle: Map[String, String] = Map(
    "q233_text_index" -> q101Sql,
    "q234_text_index_dml" -> q234Sql,
    "q244_text_index_rewrite" -> q101Sql,
    "q249_text_stale_serve" -> q234Sql,
    "q242_text_search_and" -> q242Sql,
    "q243_text_search_phrase" -> q243Sql,
    "q140_grouped_topk" -> q140Sql,
    "q136_bigram_lm" -> q136Sql,
    "q134_dsir_sample" -> q134Sql,
    "q135_gopher_rules" -> q135Sql,
    "q156_ccnet_split" -> q156Sql,
    "q153_zipf_profile" -> q153Sql,
    "q131_token_entropy" -> q131Sql,
    "q132_bpe_vocab" -> q132Sql,
    "q133_bpe_encode" -> q133Sql,
    "q25_lang_id" -> q25Sql,
    "q26_text_quality" -> q26Sql,
    "q27_token_stats" -> q27Sql,
    "q28_fingerprint" -> q28Sql,
    "q54_tfidf" -> q54Sql,
    "q66_pii_scrub" -> q66Sql,
    "q68_repetition" -> q68Sql,
    "q69_decontaminate" -> q69Sql,
    "q84_unigram_lm" -> q84Sql,
    "q101_bm25_topk" -> q101Sql,
    "q114_nb_classifier" -> q114Sql,
    "q122_collocations" -> q122Sql
  )
}
