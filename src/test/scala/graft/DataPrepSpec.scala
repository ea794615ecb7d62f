package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Data-prep operators: string predicates must reach the scan; the hash
  * split must be reproducible and well-proportioned; stratified sampling
  * must hit its per-stratum rates and be seed-deterministic. */
class DataPrepSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("LIKE-class predicates are pushed into the parquet scan") {
    val df = ops.DataPrep.q56LikePred(spark, dir)
    val scan = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
    val pushed = scan.metadata("PushedFilters")
    assert(pushed.contains("StringContains(p_type,ECO)"), pushed)
    assert(pushed.contains("StringStartsWith(p_name,b)"), pushed)
    assert(df.count() > 0)
  }

  test("hash split proportions are near 75/12.5/12.5 and assignment is stable") {
    val counts = ops.DataPrep.q57HashSplit(spark, dir).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.75) < 0.08, counts.toString)
    assert(math.abs(counts("val") / n - 0.125) < 0.06, counts.toString)
    assert(math.abs(counts("test") / n - 0.125) < 0.06, counts.toString)
    // content-hash assignment is evaluation-independent: a second run
    // yields identical row-level assignments (contrast rand(), where a
    // different partitioning changes every row's draw)
    val a = ops.DataPrep.q57HashSplit(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    val a2 = ops.DataPrep.q57HashSplit(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == a2.toSeq)
  }

  test("mixture sampling keeps each domain near its configured rate") {
    import org.apache.spark.sql.functions.col
    val kept = ops.DataPrep.q70Mixture(spark, dir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, dir)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("en" -> 230.0 / 256, "de" -> 128.0 / 256, "fr" -> 64.0 / 256)
    for ((lang, rate) <- want if total.contains(lang)) {
      val got = kept.getOrElse(lang, 0L).toDouble / total(lang)
      assert(math.abs(got - rate) < 0.12, s"$lang kept $got, want ~$rate")
    }
    // determinism: re-evaluation yields the identical membership set
    val a = ops.DataPrep.q70Mixture(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = ops.DataPrep.q70Mixture(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a === b)
  }

  test("stratified sample hits per-language fractions, deterministically") {
    val totals = Tables.documents(spark, dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows1 = ops.DataPrep.q58StratifiedSample(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    val s1 = rows1.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25, "es" -> 0.25, "zh" -> 0.1)
    expected.foreach { case (lang, frac) =>
      val got = s1.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - frac) < 0.15, s"$lang rate $got want ~$frac")
    }
    // determinism: membership is a pure function of doc_id — the rerun
    // (and a repartitioned rerun) yields the identical membership set
    val rows2 = ops.DataPrep.q58StratifiedSample(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(rows1 === rows2)
    val repart = ops.DataPrep.q58StratifiedSample(spark, dir)
    val rows3 = repart.repartition(7).orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(rows1 === rows3)
  }

  test("profile min/max text never uses scientific notation, at any magnitude") {
    import org.apache.spark.sql.functions._
    // the q72 float text path: DECIMAL(38,6) renders plain at >= 1e7
    // where a raw double→string cast would render "1.0E7" (≠ DuckDB)
    val rendered = spark.range(1).select(
      when(lit(1.0e7) === 0.0, lit("0.000000"))
        .otherwise(lit(1.0e7).cast(org.apache.spark.sql.types.DecimalType(38, 6)).cast("string")).as("big"),
      when(lit(0.0) === 0.0, lit("0.000000"))
        .otherwise(lit(0.0).cast(org.apache.spark.sql.types.DecimalType(38, 6)).cast("string")).as("zero"))
      .head()
    assert(rendered.getString(0) == "10000000.000000") // DuckDB prints the same
    assert(rendered.getString(1) == "0.000000")        // not BigDecimal's "0E-6"
    // and the real profile emits E-free text for the double column
    val prof = ops.DataPrep.q72Profile(spark, dir)
      .filter(col("col") === "o_totalprice").head()
    for (i <- Seq(4, 5)) { // min_v, max_v
      assert(!prof.getString(i).toUpperCase.contains("E"), s"sci notation: ${prof.getString(i)}")
      assert(prof.getString(i).matches("-?\\d+\\.\\d{6}"), s"not plain: ${prof.getString(i)}")
    }
  }

  test("sequence packing fills every window to capacity and reassembles every document") {
    import org.apache.spark.sql.functions.{col, lit, lower, regexp_extract_all, size}
    val segs = ops.DataPrep.q81SeqPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(segs.nonEmpty)
    // every window except the final one is exactly full; windows are dense
    val byWin = segs.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val maxWin = byWin.keys.max
    byWin.foreach { case (w, tot) =>
      if (w != maxWin) assert(tot == 128L, s"window $w holds $tot tokens")
      else assert(tot > 0L && tot <= 128L, s"final window holds $tot")
    }
    assert(byWin.keySet == (0L to maxWin).toSet, "window ids must be dense")
    // per document: segments are contiguous from offset 0 and their
    // lengths sum to the document's token count — nothing lost or split
    // incorrectly by the two-level distributed cumsum
    val tokCounts = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    segs.groupBy(_._2).foreach { case (d, ss) =>
      val sorted = ss.sortBy(_._1)
      assert(sorted.head._3 == 0L, s"doc $d starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(n._3 == p._3 + p._4, s"doc $d gap at window ${n._1}")
        case _ => ()
      }
      assert(sorted.map(_._4).sum == tokCounts(d), s"doc $d token count")
    }
  }

  test("sequence-pack payload reconstructs the exact corpus token stream; bucket size is semantics-free") {
    import org.apache.spark.sql.functions.{col, lit, lower, regexp_extract_all}
    val wins = ops.DataPrep.q82SeqPackPayload(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(wins.nonEmpty)
    // every window except the final one carries exactly 128 tokens, and
    // the text payload agrees with the declared token count
    wins.dropRight(1).foreach { case (w, _, nt, _) =>
      assert(nt == 128L, s"window $w holds $nt tokens")
    }
    wins.foreach { case (w, _, nt, txt) =>
      assert(txt.split(" ").length.toLong == nt, s"window $w text/count mismatch")
    }
    // stitching every window in order reproduces the doc_id-ordered
    // corpus token stream exactly — nothing lost, duplicated, reordered
    val stream = wins.sortBy(_._1).map(_._4).mkString(" ")
    val corpus = Tables.documents(spark, dir)
      .orderBy(col("doc_id"))
      .select(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
      .collect().flatMap(_.getSeq[String](0)).mkString(" ")
    assert(stream == corpus)
    // scanBucket is a partitioning knob, not a semantics knob: a tiny
    // bucket (many bucket-offset rows through the serial cumsum) yields
    // the byte-identical layout
    val a = ops.DataPrep.seqPackSegments(spark, dir)
      .orderBy("window_id", "doc_id").collect().toSeq
    val b = ops.DataPrep.seqPackSegments(spark, dir, scanBucket = 7L)
      .orderBy("window_id", "doc_id").collect().toSeq
    assert(a == b)
  }

  test("CDC merge applies updates, drops deletes, appends inserts, passes the rest through") {
    val base = Tables.orders(spark, dir)
    val nBase = base.count()
    val byLastDigit = base.groupBy(pmod(col("o_orderkey"), lit(10)).as("d")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = ops.DataPrep.q85MergeUpsert(spark, dir)
    val srcCounts = merged.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(srcCounts("upd") == byLastDigit(3L))
    assert(srcCounts("ins") == byLastDigit(5L))
    assert(srcCounts("base") == nBase - byLastDigit(3L) - byLastDigit(7L))
    // no deleted key survives; every insert key is shifted out of the base range
    assert(merged.filter(pmod(col("o_orderkey"), lit(10)) === 7 &&
      col("o_orderkey") < 20000000L).count() == 0)
    assert(merged.filter(col("src") === "ins" && col("o_orderkey") < 20000000L).count() == 0)
    // an updated row carries the recomputed price, not the base price
    val probe = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      .select(col("o_orderkey"), col("o_totalprice")).first()
    val got = merged.filter(col("o_orderkey") === probe.getLong(0)).first()
    assert(got.getAs[String]("src") == "upd")
    // ×2.0 is exact in IEEE — no rounding model needed (see q85 scaladoc)
    assert(got.getAs[Double]("o_totalprice") == probe.getDouble(1) * 2.0)
    // the base side never shuffles: the plan has no exchange on the base scan
    // (both joins broadcast) — assert no SortMergeJoin/ShuffledHashJoin
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
  }

  test("weighted sample skews toward its weight: sampled docs are longer than the corpus mean") {
    val sample = ops.DataPrep.q103WeightedSample(spark, dir)
    assert(sample.count() == 100)
    import org.apache.spark.sql.functions.{avg => sqlAvg}
    val sampleAvg = sample.agg(sqlAvg(col("n_chars"))).head.getDouble(0)
    val corpusAvg = Tables.documents(spark, dir).agg(sqlAvg(col("n_chars"))).head.getDouble(0)
    // w = n_chars: A-ES inclusion probability rises with weight, so the
    // 100-doc sample must average meaningfully longer than the corpus
    assert(sampleAvg > corpusAvg,
      s"sample avg $sampleAvg not above corpus avg $corpusAvg")
    // determinism: a second evaluation is the identical sample
    val a = sample.collect().map(_.getLong(0)).toSeq
    val b = ops.DataPrep.q103WeightedSample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("expectations (q143): report shape exact; counts match driver-side recomputes") {
    val rows = ops.DataPrep.q143Expectations(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.length == 5)
    // pass is exactly the zero-violation indicator
    rows.foreach { case (c, v, p) => assert(p == (if (v == 0) 1 else 0), c) }
    // recompute two checks independently
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_linenumber", "l_quantity").collect()
    val qViol = li.count(r => { val q = r.getDouble(2); q < 1 || q > 50 })
    assert(rows.find(_._1.contains("l_quantity")).get._2 == qViol)
    val dupViol = li.groupBy(r => (r.getLong(0), r.getInt(1))).values
      .map(g => g.size - 1).sum
    assert(rows.find(_._1.contains("unique")).get._2 == dupViol)
    val custKeys = Tables.customer(spark, dir).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val fkViol = Tables.orders(spark, dir).select("o_custkey").collect()
      .count(r => !custKeys(r.getLong(0)))
    assert(rows.find(_._1.contains("references")).get._2 == fkViol)
  }

  test("balanced oversample (q139): every language lands exactly on target; copies deterministic") {
    val rows = ops.DataPrep.q139BalancedOversample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val target = byLang.values.max
    // exact balance: each language contributes exactly `target` rows
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      assert(rs.length.toLong == target, s"$lang: ${rs.length} != $target")
    }
    // every doc appears, with copies numbered 1..n_copies densely
    rows.groupBy(_._1).foreach { case (id, rs) =>
      val n = rs.head._3
      assert(rs.map(_._4).sorted.toSeq == (1L to n), s"doc $id copies not dense")
    }
    assert(rows.map(_._1).distinct.length == docs.length, "every doc present")
    // deterministic: a language's copy counts differ by at most 1 and
    // floor(target/n) is the base
    byLang.foreach { case (lang, n) =>
      val counts = rows.filter(_._2 == lang).groupBy(_._1).map(_._2.head._3).toSeq
      assert(counts.toSet.subsetOf(Set(target / n, target / n + 1)), s"$lang counts $counts")
    }
  }

  test("budget mix: every language fills to its budget maximally, never over") {
    import org.apache.spark.sql.functions.{max => sqlMax}
    def budgetOf(lang: String): Long =
      if (lang == "en") 200000L else if (lang == "de") 100000L else 50000L
    val kept = ops.DataPrep.q107BudgetMix(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(kept.nonEmpty)
    val byLang = kept.groupBy(_._2)
    // within budget, and MAXIMAL: the highest-priority skipped doc of
    // each language would not have fit
    import org.apache.spark.sql.functions.{md5 => sqlMd5, concat => sqlConcat}
    val all = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        sqlMd5(sqlConcat(col("doc_id").cast("string"), lit("|graft-budget-1"))).as("pr"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    byLang.foreach { case (lang, rows) =>
      val used = rows.map(_._3).sum
      assert(used <= budgetOf(lang), s"$lang over budget: $used")
      assert(rows.map(_._4).max == used) // cum of the fill == total kept
      val keptIds = rows.map(_._1).toSet
      val firstSkipped = all.filter(d => d._2 == lang && !keptIds.contains(d._1))
        .sortBy(d => (d._4, d._1)).headOption
      firstSkipped.foreach { d =>
        assert(used + d._3 > budgetOf(lang),
          s"$lang: skipped doc ${d._1} (${d._3} chars) would still fit in ${budgetOf(lang) - used}")
      }
    }
  }

  test("temperature mix: shares sum to 1, alpha<1 flattens toward tail languages, values match hand recompute") {
    val rows = ops.DataPrep.q111TemperatureMix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length >= 2, "need at least two languages for the flattening property")
    // both distributions are distributions (6-decimal rounding slack)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4)
    // alpha = 0.3 flattens: the head language is downweighted (q < p),
    // the tail language upweighted (q > p) — the whole point of the op
    val head = rows.maxBy(_._3)
    val tail = rows.minBy(_._3)
    assert(head._5 < head._4, s"head ${head._1}: q ${head._5} !< p ${head._4}")
    assert(tail._5 > tail._4, s"tail ${tail._1}: q ${tail._5} !> p ${tail._4}")
    assert(head._6 < 1.0 && tail._6 > 1.0)
    // hand recompute from the raw masses
    val total = rows.map(_._3).sum.toDouble
    val spow = rows.map(r => math.pow(r._3.toDouble, 0.3)).sum
    rows.foreach { r =>
      assert(math.abs(r._4 - r._3 / total) < 1e-6, s"${r._1} p")
      assert(math.abs(r._5 - math.pow(r._3.toDouble, 0.3) / spow) < 1e-6, s"${r._1} q")
      assert(math.abs(r._6 - (math.pow(r._3.toDouble, 0.3) / spow) / (r._3 / total)) < 1e-6, s"${r._1} oversample")
    }
    // plan: the stats attach is a broadcast nested-loop (1-row build) —
    // no shuffle beyond the two tiny partial aggs
    val plan = ops.DataPrep.q111TemperatureMix(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("epoch shuffle: shards are balanced, positions contiguous, layout salt-deterministic") {
    val rows = ops.DataPrep.q88EpochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    assert(n == Tables.documents(spark, dir).count())
    // every doc exactly once
    assert(rows.map(_._3).distinct.length == n)
    // positions are 1..size(shard) within each shard
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length.toLong), s"shard $shard")
      // binomial balance: each shard within 3σ of n/8
      val exp = n / 8.0
      assert(math.abs(rs.length - exp) < 3 * math.sqrt(exp * 7.0 / 8), s"shard $shard size ${rs.length}")
    }
    // identical on rerun (content-hash layout, no RNG stream)
    val again = ops.DataPrep.q88EpochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
    // the permutation actually scrambles: the first shard's first few
    // docs are not simply the lowest doc_ids
    val firstShard = rows.filter(_._1 == 0L).sortBy(_._2).take(5).map(_._3)
    assert(firstShard.toSeq != firstShard.sorted.toSeq || firstShard.max > 10)
  }

  test("q159 RAG chunks: full coverage, 25% neighbor overlap, every chunk contributes new tokens") {
    val chunks = ops.DataPrep.q159RagChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(chunks.nonEmpty)
    val toks = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.regexp_extract_all(
          org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.col("text")),
          org.apache.spark.sql.functions.lit("[a-z0-9]+"),
          org.apache.spark.sql.functions.lit(0)).as("ws"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val ws = toks(doc)
      val sorted = cs.sortBy(_._2)
      // chunk_idx contiguous from 0; starts step by the stride
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, idx, start, nToks, textChunk) =>
        assert(start == idx * 24, s"doc $doc chunk $idx starts at $start")
        // the text IS the token slice
        assert(textChunk == ws.slice(start.toInt, start.toInt + 32).mkString(" "))
        assert(nToks == math.min(32L, ws.size - start))
        assert(nToks > 0)
      }
      // coverage: last chunk reaches the final token
      val last = sorted.last
      assert(last._3 + last._4 == ws.size.toLong,
        s"doc $doc: chunks end at ${last._3 + last._4} of ${ws.size} tokens")
      // every non-first chunk contributes >= 1 token beyond the previous
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 + b._4 > a._3 + a._4, s"doc $doc chunk ${b._2} adds no new tokens")
          // and overlaps its neighbor by the full 8 tokens when interior
          if (b._4 == 32L) assert(a._3 + a._4 - b._3 >= 8L)
        case _ => ()
      }
    }
    // every tokenized doc got chunks
    assert(chunks.map(_._1).distinct.length == toks.count(_._2.nonEmpty))
  }
}
