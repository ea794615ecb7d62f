package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PageRank (q119): the DuckDB oracle pins exact values cross-engine;
  * this spec replays the whole iteration driver-side from the raw edges
  * and pins the structural invariants a centrality measure must hold. */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  test("pagerank matches a driver-side replay; mass conserved; dangling sinks outrank sources") {
    val edges = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey") + 1000000L)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    def round9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val dm = nodes.filterNot(outDeg.contains).map(r).sum
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outDeg(s) }.sum
      }
      r = nodes.map(v =>
        v -> round9(0.15 / n + 0.85 * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    val expected = r.map { case (k, v) =>
      k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = ops.Advanced.q119PageRank(spark, dir).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(got.keySet == expected.keySet, "node universe")
    got.foreach { case (node, pr) =>
      // replay sums in a different order than Spark; 2e-9 covers a
      // boundary-straddling round(·,9) before the final 6-decimal round
      assert(math.abs(pr - expected(node)) <= 2e-9, s"node $node: $pr vs ${expected(node)}")
    }
    // mass conservation (up to N accumulated rounding ulps)
    assert(math.abs(got.values.sum - 1.0) < 1e-3, s"mass ${got.values.sum}")
    assert(got.values.forall(_ > 0), "every node keeps the teleport floor")
    // structure: suppliers (sinks, many in-edges) accumulate mass that
    // customers (sources, no in-edges) can only get via teleport +
    // dangling spread — the mean supplier must outrank the mean customer
    val (supp, cust) = got.partition(_._1 >= 1000000L)
    assert(supp.values.sum / supp.size > cust.values.sum / cust.size,
      "suppliers should on average outrank customers in a bipartite sink graph")
  }

  test("triangles (q129): counts match a brute-force driver-side enumeration") {
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = items.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toVector).toMap
      .filter(_._2.size <= 20)
    val edges: Set[(Long, Long)] = baskets.values.toSeq.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // brute force: for each edge (u,v), common neighbors w > v close a
    // triangle exactly once under the u < v < w canonical ordering
    val nTri = edges.toSeq.map { case (u, v) =>
      adj.getOrElse(u, Set.empty).count(w => w > v && edges.contains((v, w)))
    }.sum.toLong
    val deg = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nWedges = deg.values.map(d => d * (d - 1) / 2).sum
    val row = ops.Advanced.q129Triangles(spark, dir).collect().head
    assert(row.getLong(0) == edges.size.toLong, "n_edges")
    assert(row.getLong(1) == nWedges, "n_wedges")
    assert(row.getLong(2) == nTri, s"n_triangles: ${row.getLong(2)} vs $nTri")
    val expT = BigDecimal(3.0 * nTri / nWedges)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(3) == expT, "transitivity")
    // the graph must actually have non-trivial structure for the test
    // to mean anything: triangles exist but the graph is not a clique
    assert(nTri > 0 && nTri < nWedges / 3, s"degenerate graph: $nTri tri / $nWedges wedges")
  }
}
