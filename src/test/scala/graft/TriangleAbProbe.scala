package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (PERF.md r12): A/B of the two q129 counting strategies —
  * the r11 wedge+closing-join plan vs the r12 adjacency edge-iterator
  * plan (native sorted_intersect_count) — end to end at sf0.1,
  * cache-cleared between legs so each pays its own graph build.
  *
  *   sbt "Test/runMain graft.TriangleAbProbe"
  */
object TriangleAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    try {
      def leg(name: String, f: => org.apache.spark.sql.DataFrame): (Double, Seq[Any]) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val row = f.collect().head.toSeq
        ((System.nanoTime() - t0) / 1e9, row)
      }
      // one untimed warmup each (JIT + codegen), then two timed legs each
      leg("warm-adj", ops.Advanced.q129Triangles(spark, dir))
      leg("warm-wedge", ops.Advanced.q129TrianglesWedge(spark, dir))
      val legs = Seq(
        "wedge" -> (() => ops.Advanced.q129TrianglesWedge(spark, dir)),
        "adj" -> (() => ops.Advanced.q129Triangles(spark, dir)),
        "wedge" -> (() => ops.Advanced.q129TrianglesWedge(spark, dir)),
        "adj" -> (() => ops.Advanced.q129Triangles(spark, dir)))
      var rows = Set.empty[Seq[Any]]
      legs.foreach { case (name, f) =>
        val (s, row) = leg(name, f())
        rows += row
        println(f"[tri-ab] $name%-6s ${s}%6.2f s  $row")
      }
      assert(rows.size == 1, s"plans disagree: $rows")
      println("[tri-ab] ALL LEGS AGREE")
    } finally spark.stop()
  }
}
