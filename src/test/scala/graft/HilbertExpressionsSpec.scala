package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native Hilbert expressions must agree with a driver-side replay
  * of the same walks, survive nulls, and actually participate in
  * whole-stage codegen (the whole point of replacing the interpreted
  * fold — see PERF.md r11). The curve-correctness properties themselves
  * (bijection, unit-step, fold equality) are pinned in LayoutSpec. */
class HilbertExpressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("hilbert_index matches the driver-side walk on random 3-D points; negative inputs mask like the oracle") {
    graft.functions.HilbertFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(300)((rnd.nextLong(), rnd.nextLong(), rnd.nextLong()))
    val got = pts.toDF("x", "y", "z")
      .select(graft.functions.HilbertFunctions.hilbertIndex(
        Seq(col("x"), col("y"), col("z")), bits = 8).as("h"))
      .collect().map(_.getLong(0))
    val want = pts.map { case (x, y, z) =>
      graft.functions.HilbertIndex.walk(8, Array(x, y, z)) }
    assert(got.toSeq == want, "distributed evaluation diverged from the driver walk")
  }

  test("hilbert_index and hilbert_xy: null in, null out") {
    graft.functions.HilbertFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
    val out = df.select(
      graft.functions.HilbertFunctions.hilbertIndex(Seq(col("x"), col("y")), 8).as("h"),
      graft.functions.HilbertFunctions.hilbertXY(col("x"), col("y"), 8).as("h2"))
      .head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("both hilbert expressions participate in whole-stage codegen") {
    graft.functions.HilbertFunctions.register(spark)
    val df = spark.range(8)
      .select(graft.functions.HilbertFunctions.hilbertIndex(
        Seq(col("id"), col("id") + 1, col("id") + 2), bits = 8).as("h"),
        graft.functions.HilbertFunctions.hilbertXY(col("id"), col("id") + 1, 16).as("h2"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.nonEmpty,
      s"expected a WholeStageCodegen stage in:\n${df.queryExecution.executedPlan}")
    // and the generated path computes the same values as interpreted eval
    val rows = df.collect()
    (0 until 8).foreach { i =>
      assert(rows(i).getLong(0) ==
        graft.functions.HilbertIndex.walk(8, Array(i.toLong, i + 1L, i + 2L)))
      assert(rows(i).getLong(1) ==
        graft.functions.HilbertIndexXY.walk(16, i.toLong, i + 1L))
    }
  }
}
