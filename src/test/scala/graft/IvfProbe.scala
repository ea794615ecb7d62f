package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop diagnostic: cell occupancy + q55 overlap for the pinned IVF
  * fit (not part of the spec suite — run via Test/runMain). */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val exact = sim.Similarity.q33CosineTopk(spark, dir).collect().map(_.getLong(0)).toSet
    val ivf = sim.Similarity.q55AnnIvf(spark, dir).collect().map(_.getLong(0)).toSet
    println(s"OVERLAP=${(exact intersect ivf).size} exact=$exact ivf=$ivf")
    spark.stop()
  }
}
