package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q61 (`percentile_approx`) carries no SQL oracle — the result is
  * sketch-specific — so, like the ANN/LSH rows, it is accuracy-bounded
  * here instead: every reported quantile must satisfy the GK rank
  * guarantee (rank error ≤ n/accuracy) against the exact per-group
  * distribution that q43 sorts for. */
class ApproxPercentileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("approx quantiles respect the rank-error guarantee per group") {
    val approx = ops.Advanced.q61ApproxPercentiles(spark, sfDir).collect()
    assert(approx.nonEmpty)
    val li = Tables.lineitem(spark, sfDir).select(col("l_returnflag"), col("l_quantity")).cache()
    // accuracy=10000 ⇒ rank error ≤ n/10000; add the same margin again for
    // boundary-interpolation slack on tiny groups
    val eps = 2.0 / 10000
    for (r <- approx; (p, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val flag = r.getString(0)
      val v = r.getDouble(1 + i)
      val grp = li.filter(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      val below = grp.filter(col("l_quantity") < v).count() / n
      val atOrBelow = grp.filter(col("l_quantity") <= v).count() / n
      assert(below <= p + eps, s"$flag p$p: ${below} of values sit below $v")
      assert(atOrBelow >= p - eps, s"$flag p$p: only ${atOrBelow} of values ≤ $v")
    }
    li.unpersist()
  }
}
