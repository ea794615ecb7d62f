package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextAnalysis

/** Crafted-string semantics for the PII scrub + normalize stage — the
  * corpus-level q66 proves cross-engine agreement; this proves the
  * patterns do the right thing on adversarial inputs. */
class PiiScrubSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.scrubPii(col("t"))).head().getString(0)
  }

  test("each pattern redacts, repeatedly, with surrounding text intact") {
    assert(scrub("mail a.b+c_d%e@sub.domain.org now") === "mail [EMAIL] now")
    assert(scrub("x@y.io and z@w.dev") === "[EMAIL] and [EMAIL]")
    assert(scrub("from 192.168.0.1 to 10.0.0.255.") === "from [IP] to [IP].")
    assert(scrub("call +303 555 0142 or 720 555 9999!") === "call [PHONE] or [PHONE]!")
  }

  test("near-misses survive unredacted") {
    assert(scrub("not an email: foo@bar (no tld)") === "not an email: foo@bar (no tld)")
    assert(scrub("version 1.2.3 stays") === "version 1.2.3 stays")
    assert(scrub("short 12 345 678 stays") === "short 12 345 678 stays")
  }

  test("mixed hit: all three kinds in one document") {
    assert(scrub("a@b.co 1.2.3.4 +111 222 3333") === "[EMAIL] [IP] [PHONE]")
  }

  test("scrub is idempotent on randomized PII-laced inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq("alpha", "Beta9", "x.y", "a@b.io", "10.0.0.7", "+303 555 0142",
      "v1.2.3", "foo@bar", "..", "@", "303 555 01429", "1.2.3.4.5")
    val docs = Seq.fill(200)(Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    val df = docs.toDF("t").select(TextAnalysis.scrubPii(col("t")).as("once"))
      .select(col("once"), TextAnalysis.scrubPii(col("once")).as("twice"))
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("normalize collapses whitespace and lowercases") {
    import spark.implicits._
    val got = Seq("  A\tB\n\nC  d  ").toDF("t")
      .select(TextAnalysis.normalize(col("t"))).head().getString(0)
    assert(got === "a b c d")
  }
}
