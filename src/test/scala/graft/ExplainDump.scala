package graft

import org.apache.spark.sql.SparkSession

/** Dev plan-audit runner: prints the formatted physical plan of the
  * named SparkEntry queries (all of them with no args). Usage:
  * `sbt "Test/runMain graft.ExplainDump q77_dedup_keeplist q03_top_revenue"`.
  * Iterative operators (q65/q77/q78) execute their driver-coordinated
  * loop during plan CONSTRUCTION — the printed plan is the final
  * returned dataflow, which is the part worth auditing. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      Caches.drain()
    }
    spark.stop()
  }
}
