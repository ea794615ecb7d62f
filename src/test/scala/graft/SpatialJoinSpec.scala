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

  test("r16: polygon-polygon (q216), radius (q217), and KNN (q219) joins stay cartesian-free") {
    for (df <- Seq(ops.TimeSeries.q216CaicIntersects(spark, "/root/testdata/sf0.001"),
      ops.TimeSeries.q217RadiusJoin(spark, "/root/testdata/sf0.001"),
      ops.TimeSeries.q219KnnJoin(spark, "/root/testdata/sf0.001"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"spatial join degenerated:\n$plan")
      assert(plan.contains("HashJoin"), s"expected a hash join on the cell key:\n$plan")
    }
  }

  test("r16: radius grid join equals the brute-force theta join at two SFs") {
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val dir = s"/root/testdata/$sf"
      val grid = ops.TimeSeries.q217RadiusJoin(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val p = graft.Tables.customer(spark, dir).select(col("c_custkey").as("p_id"),
        pmod(col("c_custkey") * 13L, lit(1000L)).as("px"),
        pmod(col("c_custkey") * 41L, lit(1000L)).as("py"))
      val q = graft.Tables.supplier(spark, dir).select(col("s_suppkey").as("q_id"),
        pmod(col("s_suppkey") * 23L, lit(1000L)).as("qx"),
        pmod(col("s_suppkey") * 53L, lit(1000L)).as("qy"))
      val ref = p.crossJoin(q)
        .withColumn("dist2", (col("px") - col("qx")) * (col("px") - col("qx")) +
          (col("py") - col("qy")) * (col("py") - col("qy")))
        .where(col("dist2") <= 64L)
        .select("p_id", "q_id", "dist2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(grid === ref,
        s"$sf: missing=${(ref -- grid).take(3)} extra=${(grid -- ref).take(3)}")
      assert(grid.nonEmpty, s"degenerate fixture at $sf: no pairs within the radius")
    }
  }
}
