package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** q202 spatial bbox join (r15): the 2-D grid-binned equi join must
  * equal the brute-force theta join EXACTLY (same pairs, same
  * intersection corners) at two scale factors, and the plan must be a
  * hash join on the grid key — no cartesian/broadcast-nested-loop
  * anywhere (the shape that dies at 100 TB). */
class SpatialJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("spatial-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def brute(dir: String) = {
    import org.apache.spark.sql.functions._
    ops.TimeSeries.bboxAreas(spark, dir)
      .join(ops.TimeSeries.bboxZones(spark, dir),
        col("axmin") <= col("bxmax") && col("bxmin") <= col("axmax") &&
          col("aymin") <= col("bymax") && col("bymin") <= col("aymax"))
      .select(col("area_id"), col("zone_id"),
        greatest(col("axmin"), col("bxmin")).as("ix"),
        greatest(col("aymin"), col("bymin")).as("iy"))
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"grid + min-corner dedup equals brute force at $sf") {
      val dir = s"/root/testdata/$sf"
      val grid = rowsOf(ops.TimeSeries.q202BboxJoin(spark, dir))
      val ref = rowsOf(brute(dir))
      assert(grid === ref,
        s"missing=${(ref -- grid).take(3)} extra=${(grid -- ref).take(3)} " +
          s"(grid=${grid.size}, brute=${ref.size})")
      assert(grid.nonEmpty, "degenerate fixture: no overlapping pairs at all")
      // exactly-once: result pairs are unique (the Set above would mask
      // duplicates — count through the DataFrame)
      val df = ops.TimeSeries.q202BboxJoin(spark, dir)
      assert(df.count() === df.dropDuplicates("area_id", "zone_id").count(),
        "a pair was emitted from more than one grid cell")
    }
  }

  test("the plan is an equi hash join on the grid key — no cartesian, no nested loop") {
    val plan = ops.TimeSeries.q202BboxJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "bbox join degenerated to a cartesian product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "bbox join degenerated to a nested-loop join")
    assert(plan.contains("HashJoin"), s"expected a hash join on (gx, gy):\n$plan")
  }
}
