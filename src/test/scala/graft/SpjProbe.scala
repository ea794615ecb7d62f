package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (PERF.md r15): the storage-partitioned-join payoff
  * MEASURED — the same fact-fact join on bucket(16, k) co-partitioned
  * tables, with the SPJ machinery on vs off (broadcast disabled both
  * ways: the exchange is the question). Prints both walls and the
  * exchange counts from the executed plans; asserts the SPJ plan is
  * exchange-free and both answers agree exactly.
  *
  *   sbt -mem 8192 "Test/runMain graft.SpjProbe"
  */
object SpjProbe {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_spj_probe").toString
    try {
      spark.conf.set("spark.sql.catalog.graftcat",
        classOf[graft.sources.GraftCatalog].getName)
      val a = s"graftcat.`$root/a`"
      val b = s"graftcat.`$root/b`"
      spark.sql(s"CREATE TABLE $a (k BIGINT, v DOUBLE) USING `graft-jsondoc` " +
        "PARTITIONED BY (bucket(16, k))")
      spark.sql(s"CREATE TABLE $b (k BIGINT, w DOUBLE) USING `graft-jsondoc` " +
        "PARTITIONED BY (bucket(16, k))")
      val n = 2000000L
      spark.range(n).select(col("id").as("k"), (col("id") * 1.5).as("v"))
        .writeTo(a).append()
      spark.range(n / 2).select((col("id") * 2).as("k"), (col("id") * 2.0).as("w"))
        .writeTo(b).append()

      val q = s"SELECT count(*) AS n, CAST(sum(a.k) AS BIGINT) AS s " +
        s"FROM $a a JOIN $b b ON a.k = b.k"

      def run(): (Long, Long, Int, Double) = {
        val t0 = System.nanoTime()
        val df = spark.sql(q)
        val row = df.collect()(0)
        val wall = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
        (row.getLong(0), row.getLong(1), ex, wall)
      }

      val (n1, s1, ex1, w1) = run() // warm-up + SPJ
      val (n2, s2, ex2, w2) = run() // SPJ, warm
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val (n3, s3, ex3, w3) = run() // shuffled control, warm
      assert(ex2 == 0, s"SPJ plan must carry no hash exchange, got $ex2")
      assert(ex3 >= 2, s"control plan should shuffle both sides, got $ex3")
      assert(n2 == n3 && s2 == s3 && n1 == n2 && s1 == s2,
        s"answers diverged: ($n1,$s1) ($n2,$s2) ($n3,$s3)")
      println(f"SPJ join (0 exchanges): $w2%.2f s | shuffled control " +
        f"($ex3%d exchanges): $w3%.2f s | speedup ${w3 / w2}%.2fx " +
        f"on ${n}%,d x ${n / 2}%,d rows")
      println(s"""{"probe":"spj","spj_wall_s":${f"$w2%.2f"},"shuffle_wall_s":${
        f"$w3%.2f"},"spj_exchanges":$ex2,"control_exchanges":$ex3}""")
      println("ALL ASSERTIONS PASSED")
    } finally {
      spark.stop()
    }
  }
}
