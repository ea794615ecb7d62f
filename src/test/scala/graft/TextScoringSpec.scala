package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM cross-entropy (q84): the DuckDB oracle pins the exact
  * values at sf0.01; this spec pins the MODEL semantics against an
  * independent driver-side reference implementation, plus the
  * monotonicity property that makes the score a usable quality filter. */
class TextScoringSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def tokenize(s: String): Seq[String] =
    "[a-z0-9]+".r.findAllIn(s.toLowerCase).toSeq

  test("cross-entropy matches a driver-side reference model exactly") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> tokenize(r.getString(1))).toMap
    // reference: add-one-smoothed unigram model over the same corpus
    val cf = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val nCorpus = cf.values.sum
    val vocab = cf.size.toLong
    def xent(toks: Seq[String]): Double = {
      val tf = toks.groupBy(identity).map { case (t, xs) => t -> xs.size }
      val s = tf.map { case (t, n) =>
        n * math.log((cf(t) + 1).toDouble / (nCorpus + vocab)) }.sum
      -s / toks.size
    }
    val got = text.TextAnalysis.q84UnigramLm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == docs.count(_._2.nonEmpty))
    got.foreach { case (id, nt, x) =>
      assert(nt == docs(id).size, s"doc $id token count")
      assert(math.abs(x - xent(docs(id))) < 1e-6, s"doc $id: $x vs ${xent(docs(id))}")
    }
    // the filter property: a corpus of the most frequent token scores
    // lower (more in-distribution) than one of the rarest token
    val common = cf.maxBy(_._2)._1
    val rare = cf.minBy(_._2)._1
    assert(xent(Seq.fill(10)(common)) < xent(Seq.fill(10)(rare)))
    // and every real doc sits between those two extremes
    got.foreach { case (id, _, x) =>
      assert(x >= xent(Seq.fill(10)(common)) - 1e-9 && x <= xent(Seq.fill(10)(rare)) + 1e-9,
        s"doc $id out of band")
    }
  }

  test("grouped top-k (q140): TopK aggregator equals the window form; buffers stay bounded") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = text.TextAnalysis.q140GroupedTopk(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the window twin computed in-Spark over identical inputs
    val w = Window.partitionBy(col("lang")).orderBy(col("q").desc, col("doc_id").asc)
    val viaWindow = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        round(text.TextAnalysis.qualityScoreCol, 6).as("q"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 20)
      .select(col("lang"), col("rk"), col("doc_id"), col("q"))
      .orderBy(col("lang"), col("rk")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
    // direct Aggregator laws on a hand case: bounded, sorted, tie -> min id
    val t = new functions.TopK(3)
    val fed = Seq(functions.Scored(1.0, 5), functions.Scored(2.0, 9),
      functions.Scored(2.0, 1), functions.Scored(0.5, 7), functions.Scored(3.0, 2))
    val red = fed.foldLeft(t.zero)(t.reduce)
    assert(red == Seq(functions.Scored(3.0, 2), functions.Scored(2.0, 1), functions.Scored(2.0, 9)))
    // merge of two partials equals reduce over the union
    val (l, r) = fed.splitAt(2)
    val merged = t.merge(l.foldLeft(t.zero)(t.reduce), r.foldLeft(t.zero)(t.reduce))
    assert(merged == red)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bigram LM (q136): cross-entropy matches a driver-side Jelinek-Mercer reference; order-sensitive") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq).toMap
    val bigrams = docs.values.toSeq.filter(_.size >= 2).flatMap(t => t.zip(t.tail))
    val c2 = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cf = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val (nCorpus, vocab) = (cf.values.sum, cf.size.toLong)
    def xent2(toks: Seq[String]): Double = {
      val pairs = toks.zip(toks.tail)
      val s = pairs.groupBy(identity).map { case (p @ (a, b), xs) =>
        val p2 = (c2.getOrElse(p, 0L) + 1).toDouble / (c1.getOrElse(a, 0L) + vocab)
        val p1 = (cf(b) + 1).toDouble / (nCorpus + vocab)
        xs.size * math.log(0.7 * p2 + 0.3 * p1)
      }.sum
      -s / pairs.size
    }
    val got = text.TextAnalysis.q136BigramLm(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == docs.count(_._2.size >= 2))
    got.foreach { case (id, nb, x) =>
      assert(nb == docs(id).size - 1, s"doc $id bigram count")
      assert(math.abs(x - xent2(docs(id))) < 2e-6, s"doc $id: $x vs ${xent2(docs(id))}")
    }
    // the property the bigram order buys: scrambling a doc's tokens
    // (sorting them — same unigram profile, destroyed transitions) must
    // not DECREASE cross-entropy on average, and must increase it for
    // most docs. A unigram model (q84) is blind to this by construction.
    val deltas = docs.values.filter(_.size >= 2).toSeq.map(t => xent2(t.sorted) - xent2(t))
    assert(deltas.sum / deltas.size > 0, "scrambling should raise mean cross-entropy")
    assert(deltas.count(_ > 0) > deltas.size / 2, "scrambling should hurt most docs")
  }

  test("DSIR (q134): importance weights match a driver-side hashed-LM recompute; target docs rank high") {
    val B = 256
    def bucket(term: String): Long =
      java.lang.Long.parseLong(md5hex(term + "|graft-dsir-1").take(8), 16) % B
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        "[a-z]+".r.findAllIn(r.getString(3).toLowerCase).toSeq.map(bucket)))
    val tgtSrc = Set("src0", "src1", "src2", "src3")
    val corpusB = docs.flatMap(_._4).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val targetB = docs.filter(d => d._2 == "en" && tgtSrc(d._3))
      .flatMap(_._4).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val (ct, tt) = (corpusB.values.sum, targetB.values.sum)
    def weight(buckets: Seq[Long]): Double = buckets.groupBy(identity).map { case (b, xs) =>
      xs.size * (math.log((targetB.getOrElse(b, 0L) + 1).toDouble / (tt + B)) -
        math.log((corpusB(b) + 1).toDouble / (ct + B)))
    }.sum
    val expected = docs.filter(_._4.nonEmpty)
      .map(d => (d._1, d._4.size.toLong, BigDecimal(weight(d._4))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(d => (-d._3, d._1)).take(100)
    val got = text.TextAnalysis.q134DsirSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == math.min(100, expected.length))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2, s"selection order: $g vs $e")
      assert(math.abs(g._3 - e._3) < 2e-6, s"doc ${g._1} weight ${g._3} vs ${e._3}")
    }
    // the selection property DSIR exists for: target-set docs must be
    // overrepresented among the selected relative to the corpus base rate
    val selIds = got.map(_._1).toSet
    val inTarget = docs.filter(d => d._2 == "en" && tgtSrc(d._3)).map(_._1).toSet
    val selRate = selIds.count(inTarget).toDouble / selIds.size
    val baseRate = inTarget.size.toDouble / docs.length
    assert(selRate > baseRate,
      s"selected target-rate $selRate should exceed base rate $baseRate")
  }

  test("Gopher rules (q135): flags match a driver-side recompute; keep is the conjunction") {
    val rows = text.TextAnalysis.q135GopherRules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getInt(8), r.getInt(9)))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq).toMap
    assert(rows.length == docs.count(_._2.nonEmpty))
    rows.foreach { case (id, nw, nd, mwl, rWc, rMl, rStop, rTtr, rDom, keep) =>
      val toks = docs(id)
      val tf = toks.groupBy(identity).map { case (w, xs) => w -> xs.size }
      assert(nw == toks.size && nd == tf.size)
      val emwl = toks.map(_.length).sum.toDouble / toks.size
      assert(math.abs(mwl - emwl) < 1e-6)
      assert(rWc == (if (toks.size >= 20 && toks.size <= 200) 1 else 0), s"doc $id r_wordcount")
      assert(rMl == (if (emwl >= 2.0 && emwl <= 8.0) 1 else 0), s"doc $id r_meanlen")
      assert(rStop == (if (Set("the", "a").count(tf.contains) >= 2) 1 else 0), s"doc $id r_stopwords")
      assert(rTtr == (if (tf.size.toDouble / toks.size >= 0.2) 1 else 0), s"doc $id r_ttr")
      assert(rDom == (if (tf.values.max.toDouble / toks.size <= 0.2) 1 else 0), s"doc $id r_dominance")
      assert(keep == (rWc min rMl min rStop min rTtr min rDom), s"doc $id keep")
    }
    // the gate must discriminate at this SF: some docs keep, and the rule
    // set is not vacuous in aggregate (at least one rule fires somewhere)
    assert(rows.exists(_._10 == 1))
  }

  test("naive-Bayes classifier matches a driver-side reference model (q114)") {
    val curated = Set("src0", "src1", "src2", "src3")
    val rows = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), tokenize(r.getString(1)), r.getString(2)))
    // reference: multinomial NB with add-one smoothing, trained on the
    // doc_id % 10 < 8 split, positive = curated source allowlist
    val train = rows.filter(_._1 % 10 < 8)
    def classCounts(pos: Boolean): Map[String, Long] =
      train.filter(r => curated.contains(r._3) == pos)
        .flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val (cpos, cneg) = (classCounts(true), classCounts(false))
    val vocabSet = train.flatMap(_._2).toSet
    val (vocab, npos, nneg) = (vocabSet.size.toLong, cpos.values.sum, cneg.values.sum)
    val dpos = train.count(r => curated.contains(r._3)).toLong
    val prior = math.log(dpos.toDouble / (train.length - dpos))
    def score(toks: Seq[String]): Double = {
      val inVocab = toks.filter(vocabSet)  // inference-time OOV drops
      prior + inVocab.groupBy(identity).map { case (t, xs) =>
        xs.size * (math.log((cpos.getOrElse(t, 0L) + 1).toDouble / (npos + vocab)) -
          math.log((cneg.getOrElse(t, 0L) + 1).toDouble / (nneg + vocab)))
      }.sum
    }
    val got = text.TextAnalysis.q114NbClassifier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3), r.getInt(4)))
    // one output row per doc with at least one in-vocab term
    val expected = rows.filter(r => r._2.exists(vocabSet)).map(_._1).toSet
    assert(got.map(_._1).toSet == expected)
    got.foreach { case (id, isCur, isTrain, lo, pred) =>
      val r = rows.find(_._1 == id).get
      assert((isCur == 1) == curated.contains(r._3), s"doc $id label")
      assert((isTrain == 1) == (id % 10 < 8), s"doc $id split")
      assert(math.abs(lo - score(r._2)) < 1e-6, s"doc $id: $lo vs ${score(r._2)}")
      assert(pred == (if (lo > 0) 1 else 0), s"doc $id pred/score consistency")
    }
    // the model must actually separate: a synthetic doc of the positive
    // class's most indicative term scores above one of the negative's
    val posTerm = vocabSet.maxBy(t => math.log((cpos.getOrElse(t, 0L) + 1).toDouble) -
      math.log((cneg.getOrElse(t, 0L) + 1).toDouble))
    val negTerm = vocabSet.minBy(t => math.log((cpos.getOrElse(t, 0L) + 1).toDouble) -
      math.log((cneg.getOrElse(t, 0L) + 1).toDouble))
    assert(score(Seq.fill(20)(posTerm)) > score(Seq.fill(20)(negTerm)))
  }

  test("collocations (q122): top-50 adjacent-bigram PMI matches a driver-side recompute") {
    val docs = Tables.documents(spark, dir).select(col("text")).collect()
      .map(r => tokenize(r.getString(0)))
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bigrams = docs.flatMap(ws => ws.zip(ws.drop(1)))
    val bi = bigrams.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 5).toMap
    val nu = uni.values.sum.toDouble
    val nb = bigrams.size.toDouble
    def pmi(p: (String, String)): Double = {
      val raw = math.log((bi(p) / nb) / ((uni(p._1) / nu) * (uni(p._2) / nu)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = bi.keys.toSeq
      .sortBy(p => (-pmi(p), p._1, p._2)).take(50)
      .map(p => (p._1, p._2, bi(p), pmi(p)))
    val got = text.TextAnalysis.q122Collocations(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.size == 50 && got == expected,
      s"first diff: ${got.zip(expected).find(x => x._1 != x._2)}")
    // PMI must actually re-rank vs raw frequency: counts along the PMI
    // order are not simply non-increasing (else the normalization is
    // vacuous and this is just a count sort)
    assert(got.map(_._3).sliding(2).exists { case Seq(a, b) => b > a; case _ => false })
  }

  test("token entropy (q131): matches a driver-side Shannon recompute; flags the repetitive tail") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
    val got = text.TextAnalysis.q131TokenEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))).toMap
    assert(got.keySet == docs.map(_._1).toSet, "doc universe")
    docs.foreach { case (id, toks) =>
      val tf = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.size.toDouble
      // reference computes entropy the textbook way (-Σ p·log2 p); the
      // query's algebraic form must agree to the rounding boundary
      val h = -tf.values.map(c => c / n * (math.log(c / n) / math.log(2.0))).sum
      val hr = BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nTok, nDis, ent, rep) = got(id)
      assert(nTok == toks.size.toLong && nDis == tf.size.toLong, s"doc $id counts")
      assert(math.abs(ent - hr) <= 1e-6, s"doc $id: $ent vs $hr")
      assert(rep == (if (ent < 3.5) 1 else 0), s"doc $id flag")
    }
    // the signal must separate: some docs flagged, most not
    val flagged = got.values.count(_._4 == 1)
    assert(flagged > 0 && flagged < got.size / 2, s"flagged $flagged of ${got.size}")
  }

  test("BPE vocab (q132): merge table matches a driver-side Sennrich trainer") {
    val words = Tables.documents(spark, dir).select(col("text")).collect()
      .flatMap(r => "[a-z]+".r.findAllIn(r.getString(0).toLowerCase))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    var segs: Map[Vector[String], Long] = words.toSeq
      .map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = (1 to 8).map { _ =>
      val pairs = segs.toSeq.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => p -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((a, b), cnt) = pairs.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      // left-to-right non-overlapping replace of the adjacent pair
      def merge(s: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
          else { out += s(i); i += 1 }
        }
        out.result()
      }
      segs = segs.toSeq.map { case (s, c) => merge(s) -> c }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (a, b, a + b, cnt)
    }
    val got = text.TextAnalysis.q132BpeVocab(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == expected, s"first diff: ${got.zip(expected).find(x => x._1 != x._2)}")
    // training must get past single characters: later merges build on
    // earlier merged symbols (a multi-char left side appears)
    assert(expected.exists(_._1.length > 1), "no compound merge in 8 rounds")
  }

  test("BPE encode (q133): per-doc token accounting matches a driver-side trainer+encoder") {
    // replay the trainer to the final segmentation of every word
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
    var segs: Map[String, Vector[String]] = docs.flatMap(_._2).distinct
      .map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (_ <- 1 to 8) {
      val pairs = segs.toSeq.flatMap { case (w, s) =>
        s.zip(s.drop(1)).map(p => p -> counts(w))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val ((a, b), _) = pairs.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      segs = segs.view.mapValues { s =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
          else { out += s(i); i += 1 }
        }
        out.result()
      }.toMap
    }
    val got = text.TextAnalysis.q133BpeEncode(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, toks) =>
      val nTok = toks.map(w => segs(w).size.toLong).sum
      val nChr = toks.map(_.length.toLong).sum
      val exp = BigDecimal(nChr.toDouble / nTok)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (nw, nb, cpt) = got(id)
      assert(nw == toks.size.toLong && nb == nTok && cpt == exp,
        s"doc $id: ($nw,$nb,$cpt) vs (${toks.size},$nTok,$exp)")
      // the learned merges must compress vs character-level: strictly
      // fewer symbols than chars + end-marks for any doc using the
      // merged vocabulary, never fewer than one symbol per word
      assert(nb >= nw && nb <= nChr + nw)
    }
    val totalBpe = got.values.map(_._2).sum
    val totalCharLevel = docs.map { case (_, toks) =>
      toks.map(_.length.toLong + 1).sum }.sum
    assert(totalBpe < totalCharLevel,
      s"8 merges must compress the corpus vs character level: $totalBpe vs $totalCharLevel")
  }

  test("chi-square (q124): matches a driver-side contingency recompute") {
    val rows = Tables.documents(spark, dir)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = rows.length.toLong
    val chi2raw = cells.map { case ((s, l), o) =>
      val e = (rt(s) * ct(l)).toDouble / n
      (o - e) * (o - e) / e
    }.sum
    val chi2 = BigDecimal(chi2raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val Array(r) = ops.Advanced.q124ChiSquare(spark, dir).collect()
    assert(math.abs(r.getDouble(0) - chi2) < 1e-5, s"${r.getDouble(0)} vs $chi2")
    assert(r.getLong(1) == (rt.size - 1).toLong * (ct.size - 1))
    assert(r.getLong(2) == n)
    val v = math.sqrt(r.getDouble(0) / (n * math.min(rt.size - 1, ct.size - 1)))
    assert(math.abs(r.getDouble(3) - v) < 1e-5)
  }

  test("q156 CCNet split: per-language terciles balanced, ordered, and covering every scored doc") {
    val rows = text.TextAnalysis.q156CcnetSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(rows.nonEmpty)
    // every scored doc (docs with >= 1 token) is assigned exactly once
    val nScored = text.TextAnalysis.q84UnigramLm(spark, dir).count()
    assert(rows.length.toLong == nScored, s"${rows.length} split rows vs $nScored scored docs")
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      // ntile balance: bucket sizes within a language differ by <= 1
      val sizes = order.keys.map(s => rs.count(_._4 == s)).toSeq
      assert(sizes.max - sizes.min <= 1, s"$lang tercile sizes $sizes")
      // the split respects the score order: every head score <= every
      // middle score <= every tail score WITHIN the language (ties at
      // a boundary keep the doc_id order, so <= not <)
      val byBucket = rs.groupBy(r => order(r._4)).view.mapValues(_.map(_._3)).toMap
      for (b <- 0 to 1 if byBucket.contains(b) && byBucket.contains(b + 1))
        assert(byBucket(b).max <= byBucket(b + 1).min + 1e-12,
          s"$lang bucket $b max ${byBucket(b).max} > bucket ${b + 1} min ${byBucket(b + 1).min}")
    }
  }
}
