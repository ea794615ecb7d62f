package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** The injected optimizer rule (SparkSessionExtensions tier): the
  * levenshtein length-difference prefilter must appear in the optimized
  * plan, never change results, and hold at the optimizer's fixed point
  * (a non-idempotent rewrite would loop the batch to max iterations). */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def words = {
    import spark.implicits._
    Seq("kitten", "sitting", "kitchen", "mitten", "a", "abcdefghij")
      .toDF("w")
  }

  test("length-difference guard appears ahead of levenshtein in the plan") {
    // a file-backed relation: a local Seq would be constant-folded into a
    // LocalRelation before the plan could be inspected
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .filter(levenshtein(col("p_name"), lit("small ring")) <= 2)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("abs(") && p.contains("length("), s"guard missing:\n$p")
    // guard precedes the levenshtein conjunct (short-circuit order)
    assert(p.indexOf("abs(") < p.indexOf("levenshtein"), s"guard not first:\n$p")
  }

  test("rewrite preserves results exactly") {
    val got = words.filter(levenshtein(col("w"), lit("kitten")) <= 2)
      .collect().map(_.getString(0)).sorted.toSeq
    // hand-checked: kitten 0, mitten 1, kitchen 2, sitting 3, a 5, abcdefghij >2
    assert(got === Seq("kitchen", "kitten", "mitten"))
  }

  test("every levenshtein predicate in a multi-predicate filter gets its own guard") {
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .filter(levenshtein(col("p_name"), lit("small ring")) <= 2 &&
        levenshtein(col("p_brand"), lit("BrandX")) <= 1)
    val p = df.queryExecution.optimizedPlan.toString
    val absCount = p.sliding("abs(".length).count(_ == "abs(")
    assert(absCount >= 2, s"expected a guard per predicate, got $absCount:\n$p")
  }

  test("literal-on-LHS forms are rewritten too (k >= lev, k > lev)") {
    val base = Tables.part(spark, "/root/testdata/sf0.001")
    for (pred <- Seq(lit(2) >= levenshtein(col("p_name"), lit("small ring")),
        lit(3) > levenshtein(col("p_name"), lit("small ring")))) {
      val df = base.filter(pred)
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("abs(") && p.indexOf("abs(") < p.indexOf("levenshtein"),
        s"literal-on-LHS form not guarded:\n$p")
      // both forms mean lev <= 2; results must match the canonical form
      assert(df.count() ==
        base.filter(levenshtein(col("p_name"), lit("small ring")) <= 2).count())
    }
  }

  test("a WEAKER hand-written guard does not suppress the tight one") {
    // abs(...) <= 50 is a no-op guard next to lev <= 2: the rule must
    // still add the <= 2 prefilter (and then hold at the fixed point)
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .filter(abs(length(col("p_name")) - length(lit("small ring"))) <= 50 &&
        levenshtein(col("p_name"), lit("small ring")) <= 2)
    val p = df.queryExecution.optimizedPlan.toString
    val absCount = p.sliding("abs(".length).count(_ == "abs(")
    assert(absCount >= 2, s"tight guard missing beside the weak one ($absCount):\n$p")
  }

  test("rule is idempotent at the optimizer fixed point") {
    // a query whose condition already carries a length guard is untouched
    val df = Tables.part(spark, "/root/testdata/sf0.001")
      .filter(abs(length(col("p_name")) - length(lit("small ring"))) <= 2 &&
        levenshtein(col("p_name"), lit("small ring")) <= 2)
    val p = df.queryExecution.optimizedPlan.toString
    val absCount = p.sliding("abs(".length).count(_ == "abs(")
    assert(absCount <= 2, s"guard stacked ($absCount):\n$p")
    assert(df.count() > 0)
  }
}
