package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: measures q137's recall against exact q33 at one or more
  * scale factors. Because the refine pass ranks the PqShortlist
  * candidates by EXACT cosine, the final top-10's overlap with the
  * exact top-10 equals the shortlist's recall of the exact top-10 —
  * so one number reports both ("recall@50-shortlist"). Recorded in
  * PERF.md and the q137 board-row comment.
  *
  *   sbt "Test/runMain graft.MeasurePqRecall /root/testdata/sf0.01 /root/testdata/sf0.1"
  */
object MeasurePqRecall {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-pq-recall")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try dirs.foreach { dir =>
      val exact = sim.Similarity.q33CosineTopk(spark, dir).collect()
        .map(_.getLong(0)).toSet
      val pq = sim.Similarity.q137AnnPq(spark, dir).collect()
        .map(_.getLong(0)).toSet
      Caches.drain()
      val overlap = (exact intersect pq).size
      println(s"PQ_RECALL dir=$dir overlap@10=$overlap/10 " +
        s"(= exact-top10 recall within the PqShortlist candidates)")
    } finally spark.stop()
  }
}
