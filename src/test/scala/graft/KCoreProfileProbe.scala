package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r12): where q182's wall clock goes, component by
  * component — pair build, histogram, boundary-stratum rank, peel loop.
  *
  *   sbt "Test/runMain graft.KCoreProfileProbe"
  */
object KCoreProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    try {
      def t[A](what: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[kcore] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      import graft.ops.Advanced
      val items = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
      t("items distinct count")(println("  items=" + items.count()))
      val smallOk = items.groupBy(col("ok")).agg(count(lit(1)).as("bs"))
        .filter(col("bs") <= Advanced.BasketCap).select(col("ok"))
      val inCap = items.join(smallOk, "ok").cache()
      t("inCap materialize")(println("  inCap=" + inCap.count()))
      val ps = inCap.select(col("ok"), col("pk").as("u"))
        .join(inCap.select(col("ok"), col("pk").as("v")), Seq("ok"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup")).cache()
      t("pair build (ps materialize, inCap cached)")(println("  pairs=" + ps.count()))
      val budget = t("budget count (cached inCap)")(
        Advanced.KCoreEdgeFactor * inCap.select(col("pk")).distinct().count())
      println("  budget=" + budget)
      val hist = t("support histogram")(
        ps.groupBy(col("sup")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("sup").desc).collect())
      var cum = 0L; var sStar = -1L; var nAbove = 0L
      hist.foreach { r =>
        if (sStar < 0) {
          if (cum + r.getLong(1) >= budget) { sStar = r.getLong(0); nAbove = cum }
          else cum += r.getLong(1)
        }
      }
      println(s"  sStar=$sStar nAbove=$nAbove stratumK=${budget - nAbove}")
      t("stratum size")(println("  stratum=" +
        ps.filter(col("sup") === sStar).count()))
      val boundaryWin = ps.filter(col("sup") === sStar)
        .withColumn("rk", row_number().over(Window.orderBy(col("u"), col("v"))))
        .filter(col("rk") <= budget - nAbove).select(col("u"), col("v"))
      t("boundary rank: WINDOW (current)")(
        println("  kept=" + boundaryWin.count()))
      val boundaryTopK = ps.filter(col("sup") === sStar)
        .orderBy(col("u"), col("v")).limit((budget - nAbove).toInt)
        .select(col("u"), col("v"))
      t("boundary rank: orderBy+limit (TakeOrdered)")(
        println("  kept=" + boundaryTopK.count()))
      val edges = ps.filter(col("sup") > sStar).select(col("u"), col("v"))
        .unionByName(boundaryTopK).cache()
      t("edges materialize")(println("  edges=" + edges.count()))
      t("peel loop + final degrees")(
        println("  core=" + Advanced.kCore(edges, Advanced.KCoreK,
          Advanced.KCorePeelRounds).count()))
      // per-round breakdown of the same loop
      def coreDegrees(alive: org.apache.spark.sql.DataFrame) = {
        val sub = edges
          .join(alive.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(alive.select(col("node").as("v")), Seq("v"), "left_semi")
        sub.select(col("u").as("node")).unionByName(sub.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
      }
      val deg0 = edges.select(col("u").as("node")).unionByName(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      var alive = deg0.filter(col("d") >= Advanced.KCoreK).select(col("node")).cache()
      var n = t("round 0 (deg0)")(alive.count())
      var converged = false; var r = 0
      while (!converged && r < 24) {
        val next = coreDegrees(alive).filter(col("d") >= Advanced.KCoreK)
          .select(col("node")).cache()
        val m = t(s"round ${r + 1} agg+count")(next.count())
        converged = m == n
        alive = t(s"round ${r + 1} truncate")(graft.dedup.Dedup.truncateLineage(next))
        n = m; r += 1
      }
      t("final coreDegrees")(println("  out=" + coreDegrees(alive).count()))

      // 10x stress: ten pk/ok-shifted disjoint copies of the sf0.1
      // input run through the SAME q182 dataflow end-to-end. The graph
      // is the disjoint union (10x nodes, 10x pairs, same density), so
      // the peel does the same per-copy work at 10x width; the boundary
      // top-K is global (lowest-pk copies win the tie stratum), so the
      // core is not literally 10 replicas — the assertions are
      // structural: nonempty, converged, >= one copy's core size.
      val t10 = System.nanoTime()
      val base = Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val rep = (0 until 10).map { c =>
        base.select((col("ok") + lit(c * 100000000L)).as("ok"),
          (col("pk") + lit(c * 10000000L)).as("pk"))
      }.reduce(_ unionByName _).distinct()
      val small10 = rep.groupBy(col("ok")).agg(count(lit(1)).as("bs"))
        .filter(col("bs") <= Advanced.BasketCap).select(col("ok"))
      val inCap10 = rep.join(small10, "ok").cache()
      val ps10 = inCap10.select(col("ok"), col("pk").as("u"))
        .join(inCap10.select(col("ok"), col("pk").as("v")), Seq("ok"))
        .filter(col("u") < col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup")).cache()
      val budget10 = Advanced.KCoreEdgeFactor *
        inCap10.select(col("pk")).distinct().count()
      val hist10 = ps10.groupBy(col("sup")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("sup").desc).collect()
      var cum10 = 0L; var s10 = -1L; var nAb10 = 0L
      hist10.foreach { r =>
        if (s10 < 0) {
          if (cum10 + r.getLong(1) >= budget10) { s10 = r.getLong(0); nAb10 = cum10 }
          else cum10 += r.getLong(1)
        }
      }
      val edges10 = (if (s10 < 0) ps10.select(col("u"), col("v"))
        else ps10.filter(col("sup") > s10).select(col("u"), col("v"))
          .unionByName(ps10.filter(col("sup") === s10)
            .orderBy(col("u"), col("v")).limit((budget10 - nAb10).toInt)
            .select(col("u"), col("v"))))
        .coalesce(Advanced.edgeParts(budget10)).cache()
      println("  10x edges=" + edges10.count() + " budget=" + budget10)
      val core10 = Advanced.kCore(edges10, Advanced.KCoreK,
        Advanced.KCorePeelRounds).count()
      val dt10 = (System.nanoTime() - t10) / 1e9
      println(f"[kcore] 10x stress end-to-end: $dt10%.2f s  core=$core10")
      require(core10 >= 8127, "10x core smaller than one copy's core")
      inCap10.unpersist(); ps10.unpersist(); edges10.unpersist()
    } finally spark.stop()
  }
}
