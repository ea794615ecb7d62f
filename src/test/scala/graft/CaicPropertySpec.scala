package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.caic.{CaicModel, CaicPipeline}

/** Property tests (SURVEY.md §5.3): generated inputs checked against an
  * independent driver-side model of the reference's JS semantics.
  * Sampling is seeded and batched into one DataFrame per property so the
  * whole spec stays fast while still covering the randomized space.
  */
class CaicPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val scale = CaicModel.severity // ordered worst→best, noRating last

  /** Known ratings, unknown strings (the §7.4-1 indexOf→-1 trap), and
    * NULL (a PERMISSIVE-null-padded missing band — JS indexOf(undefined)
    * is also -1, so the model's scale.indexOf(null) = -1 matches). */
  private val ratingGen: Gen[String] =
    Gen.frequency(
      (5, Gen.oneOf(scale)),
      (2, Gen.oneOf("bogus", "EXTREME", "", "mod", "no_rating")),
      (1, Gen.const(null: String)))

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  /** JS model: Array.indexOf (−1 on miss); worst = min over seed 5. */
  private def jsIdx(s: String): Int = scale.indexOf(s)
  private def modelWorst(btl: String, tln: String, alp: String): Int =
    Seq(scale.indexOf("noRating"), jsIdx(btl), jsIdx(tln), jsIdx(alp)).min

  test("severityIndex equals the JS min-ordinal model and is permutation-invariant") {
    import spark.implicits._
    val cases = sample(for {
      b <- ratingGen; t <- ratingGen; a <- ratingGen
    } yield (b, t, a), 400)
    val df = cases.toDF("btl", "tln", "alp").select(
      col("btl"), col("tln"), col("alp"),
      CaicPipeline.severityIndex(col("btl"), col("tln"), col("alp")).as("sev"),
      // a permutation of the band arguments must not change the result
      CaicPipeline.severityIndex(col("alp"), col("btl"), col("tln")).as("sev_perm"),
      CaicPipeline.severityKey(
        CaicPipeline.severityIndex(col("btl"), col("tln"), col("alp"))).as("key"))
    df.collect().foreach { r =>
      val (b, t, a) = (r.getString(0), r.getString(1), r.getString(2))
      val expected = modelWorst(b, t, a)
      assert(r.getInt(3) == expected, s"sev($b,$t,$a)")
      assert(r.getInt(4) == expected, s"perm($b,$t,$a)")
      val key = if (r.isNullAt(5)) null else r.getString(5)
      assert(key == (if (expected >= 0) scale(expected) else null), s"key($b,$t,$a)")
    }
  }

  private case class Geom(isMulti: Boolean, baseType: String, parts: List[String])

  private val partGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    xs <- Gen.listOfN(n, Gen.choose(-179, 179))
    ys <- Gen.listOfN(n, Gen.choose(-89, 89))
  } yield xs.zip(ys).map { case (x, y) => s"[[$x,$y],[${x + 1},$y],[$x,${y + 1}]]" }
    .mkString("[", ",", "]")

  private val geomGen: Gen[Geom] = for {
    isMulti <- Gen.oneOf(true, false)
    base <- Gen.oneOf("Polygon", "LineString")
    k <- if (isMulti) Gen.choose(1, 5) else Gen.const(1)
    parts <- Gen.listOfN(k, partGen)
  } yield Geom(isMulti, base, parts)

  test("explodeMulti: one row per part, -idx ids, Multi stripped, parts preserved; singles untouched") {
    import spark.implicits._
    val geoms = sample(geomGen, 120).zipWithIndex
    val rows = geoms.map { case (g, i) =>
      val gtype = (if (g.isMulti) "Multi" else "") + g.baseType
      val coords = if (g.isMulti) g.parts.mkString("[", ",", "]") else g.parts.head
      (s"caic-$i", "Feature", s"""{"type":"$gtype","coordinates":$coords}""")
    }
    val df = rows.toDF("id", "type", "geometry")
      .withColumn("properties", struct(lit("p").as("x")))
      .select(col("id"), col("type"), col("properties"), col("geometry"))
    val out = CaicPipeline.explodeMulti(df).collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap

    geoms.foreach { case (g, i) =>
      if (g.isMulti) {
        g.parts.zipWithIndex.foreach { case (part, idx) =>
          val got = out.get(s"caic-$i-$idx")
          assert(got.isDefined, s"missing part $idx of multi $i")
          // type rewritten without Multi; coordinates = exactly this part
          assert(got.get == s"""{"type":"${g.baseType}","coordinates":$part}""")
        }
        assert(!out.contains(s"caic-$i"), s"unexploded multi $i leaked through")
      } else {
        assert(out(s"caic-$i") ==
          s"""{"type":"${g.baseType}","coordinates":${g.parts.head}}""")
      }
    }
    // row conservation: Σ parts(multi) + count(single)
    val expectedRows = geoms.map { case (g, _) => if (g.isMulti) g.parts.size else 1 }.sum
    assert(out.size == expectedRows)
  }

  test("fingerprint is invariant under punctuation/whitespace/case noise") {
    import spark.implicits._
    val texts = sample(Gen.listOfN(6,
      Gen.oneOf("quick", "brown", "Fox", "jumps", "OVER", "dog")), 100)
      .map(_.mkString(" "))
    val noisy = texts.map(t => t.toUpperCase.replace(" ", " \t ") + "!!!")
    // fingerprintColumn is bound to col("text"); evaluate each variant
    def fps(ts: Seq[String]): Array[String] = ts.toDF("text")
      .select(graft.text.TextAnalysis.fingerprintColumn.as("fp"))
      .collect().map(_.getString(0))
    fps(texts).zip(fps(noisy)).foreach { case (x, y) => assert(x == y) }
  }
}
