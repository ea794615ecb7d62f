package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r11): native hilbert_index throughput at 100× the
  * q162 row count — 15M synthetic 3-D points through the codegen'd walk
  * into a noop sink.
  *
  *   sbt "Test/runMain graft.HilbertThroughputProbe"
  */
object HilbertThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.HilbertFunctions.register(spark)
    try {
      def run(n: Long): Double = {
        val t0 = System.nanoTime()
        spark.range(n).select(graft.functions.HilbertFunctions.hilbertIndex(
            Seq(col("id"), col("id") * 7, col("id") * 13), bits = 16).as("h"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run(150000L) // warmup at board size
      val t1 = run(150000L)
      val t100 = run(15000000L)
      println(f"[hilbert-throughput] 150k: $t1%.2f s; 15M: $t100%.2f s " +
        f"(${15000000L / t100 / 1e6}%.1f M rows/s, bits=16, d=3)")
    } finally spark.stop()
  }
}
