package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the approximate (no-SQL-oracle) operators, checked
  * against their exact oracle-verified twins on real test data:
  *  - MinHash-LSH near-dup pairs vs exact n-gram Jaccard (recall)
  *  - sign-random-projection ANN vs exact cosine top-k (overlap)
  *  - HLL approx distinct vs exact distinct (relative error)
  * These are the checks the driver's rows-only gate can't make.
  */
class DedupSimSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.01"

  override def afterAll(): Unit = spark.stop()

  test("MinHash-LSH finds the exact-Jaccard near-dup pairs (high recall, verified precision)") {
    val exact = dedup.Dedup.q30NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = dedup.Dedup.q31MinhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // precision is exact by construction (candidates are re-verified with
    // true Jaccard), so LSH output must be a subset of the exact pairs
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    // 16 bands × 4 rows at threshold 0.5 → expected recall >> 0.9
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${lsh.size}/${exact.size})")
  }

  test("ANN LSH top-k overlaps the exact cosine top-k") {
    val exact = sim.Similarity.q33CosineTopk(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val ann = sim.Similarity.q35AnnLsh(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(exact.size == 10)
    // multi-probe (Hamming<=1, 5 of 16 buckets) must retain a meaningful
    // share of the true neighbors
    val overlap = (exact intersect ann).size
    assert(overlap >= 3, s"overlap $overlap of 10")
    assert(ann.size <= 10)
  }

  test("IVF ANN top-k overlaps the exact cosine top-k") {
    val exact = sim.Similarity.q33CosineTopk(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val ivf = sim.Similarity.q55AnnIvf(spark, dir).collect()
      .map(_.getLong(0)).toSet
    // probing 2 of 8 cells: most true neighbors share the query's cell
    val overlap = (exact intersect ivf).size
    assert(overlap >= 3, s"overlap $overlap of 10")
    assert(ivf.size <= 10)
  }

  test("approx_count_distinct is within its 2% configured error of exact") {
    val exact = ops.Relational.q10DistinctAgg(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap // n_part per flag
    val approx = ops.Relational.q10bApproxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val a = approx(flag)
      val err = math.abs(a - n).toDouble / n
      assert(err <= 0.06, s"flag=$flag exact=$n approx=$a err=$err") // 3σ of 2%
    }
  }

  test("SimHash pairs are textually similar, bounded, and deterministic") {
    val pairs = dedup.Dedup.q32Simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, h) => assert(a < b && h <= 6) }
    // the flagged pairs must really be near-duplicates: mean word-set
    // Jaccard well above what random doc pairs in this corpus have (~0)
    val ids = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val texts = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .filter(r => ids.contains(r.getLong(0)))
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet)
      .toMap
    val jacs = pairs.map { case (a, b, _) =>
      val (x, y) = (texts(a), texts(b))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    val meanJac = jacs.sum / jacs.length
    assert(meanJac >= 0.3, s"mean pair jaccard $meanJac")
    // seeded hashing → byte-deterministic across runs
    val again = dedup.Dedup.q32Simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == again.toSeq)
  }

  test("hot-shingle cap bounds the Jaccard verifier; default cap is a no-op here") {
    import spark.implicits._
    // doc 3's only shingle "w1 w2 w3" appears in all three docs (df=3):
    // under the default cap the (1,3)/(2,3) pairs score exactly 0.5;
    // with cap=2 the ubiquitous shingle leaves both intersections AND
    // sizes, so no pair survives — consistent, not under-counted
    val tmp = java.nio.file.Files.createTempDirectory("graft_hotshingle").toString
    Seq((1L, "w1 w2 w3 w4"), (2L, "w1 w2 w3 w5"), (3L, "w1 w2 w3"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    def pairs = dedup.Dedup.q30NgramJaccard(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == Set((1L, 3L, 0.5), (2L, 3L, 0.5)))
    spark.conf.set(dedup.Guards.ShingleDfConf, "2")
    try assert(pairs.isEmpty)
    finally spark.conf.unset(dedup.Guards.ShingleDfConf)
    // on the real corpus the default cap changes nothing: no shingle can
    // reach df=10000 in a corpus of < 10000 docs (structural no-op)
    assert(Tables.documents(spark, dir).count() < dedup.Guards.DefaultShingleDf)
  }
}
