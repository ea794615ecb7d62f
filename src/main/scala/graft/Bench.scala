package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // environment contract: local[32], shuffle.partitions=32 (not 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/parquet-footer costs land here, not on
    // the alphabetically-first timed query
    try SparkEntry.queries("q09_global_topk")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink forces full materialization of every operator (count()
    // would let Catalyst prune the whole projection away).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      // close the timing window BEFORE cache hygiene: unpersisting the
      // query's registered caches is harness bookkeeping, not query work
      val dt = (System.nanoTime() - t0) / 1e9
      // blocks cached by one query must not perturb the next query's
      // memory or timing
      Caches.drain()
      name -> dt
    }.toMap
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // headline fields appear BOTH first (the documented contract order)
    // and again LAST ("total"/"n_queries"): the driver captures a bounded
    // TAIL of the output, so when the per-query map pushes the line past
    // that bound, the tail must still carry the total on its own.
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","sf":"$sfDir","queries":$qs,"n_queries":${results.size},"total":${f(total)}}""")
    spark.stop()
  }
}
