package graft
import org.apache.spark.sql.SparkSession

object Bench {

  private def fmt(v: Double, decimals: Int): String =
    s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)

  private def jsonLine(results: Seq[(String, Double)], sfDir: String,
      key: String => String, decimals: Int, includeQueries: Boolean = true): String = {
    val qs =
      if (includeQueries)
        results.sortBy(_._1)
          .map { case (k, v) => "\"" + key(k) + "\":" + fmt(v, decimals) }
          .mkString("{", ",", "}")
      else "{}"
    val total = results.map(_._2).sum
    // "total" appears both in contract position ("value") and LAST, so a
    // tail-truncated line still ends with the headline number.
    s"""{"metric":"total","value":${fmt(total, decimals)},"unit":"sec","sf":"$sfDir","queries":$qs,"n_queries":${results.size},"total":${fmt(total, decimals)}}"""
  }

  /** Full-name line — for humans reading per-query timings. */
  def fullLine(results: Seq[(String, Double)], sfDir: String): String =
    jsonLine(results, sfDir, identity, decimals = 3)

  /** Compact duplicate printed LAST. The driver captures only the final
    * ~2000 chars of stdout, and at 80 queries the full-name line is
    * ~2400 chars — its head (and leading '{') falls off the buffer, so
    * the driver recorded parsed:null in r3 AND r4. This line uses short
    * query keys (the "qNN"/"qNNx" prefix before the first underscore —
    * unique, matching CORRECTNESS names up to the descriptive suffix)
    * and 2-decimal seconds: ~12 bytes/query keeps the whole line inside
    * the tail window (alongside sbt's trailing "[success]" line) well
    * past 100 queries — and if the surface ever grows beyond even that,
    * the per-query map is dropped entirely rather than risk a truncated
    * (unparseable) line: the headline total always lands whole.
    * BenchFormatSpec pins the budget. */
  def compactLine(results: Seq[(String, Double)], sfDir: String): String = {
    // gears: shed decimals before shedding the map — past ~130 queries
    // the 2-decimal map outgrows the tail window, but per-query
    // VISIBILITY (which queries ran, who is expensive) matters more to
    // the driver's round-over-round deltas than centisecond precision.
    // Only when even integer seconds can't fit does the map drop.
    // Keys drop the uniform "q" prefix too (r9: the 154-query board at
    // worst-case 3-digit seconds crossed the budget by 17 chars —
    // caught by BenchFormatSpec — and the prefix is 1 byte x |board|
    // of pure redundancy; "129" maps to q129 trivially).
    val short = (n: String) => n.takeWhile(_ != '_').stripPrefix("q")
    val gears = Seq(2, 1, 0).iterator
      .map(d => jsonLine(results, sfDir, short, decimals = d))
    gears.find(_.length <= 1700).getOrElse(
      jsonLine(results, sfDir, short, decimals = 1, includeQueries = false))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // environment contract: local[32], shuffle.partitions=32 (not 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // dev loop: SPARK_GRAFT_REPLAYABLE=false times the xxhash64
      // production hash family (graft.HashFamilies) — the driver never
      // sets it, so its boards always run the oracle-replayable default
      .config("spark.graft.replayableHashes",
        sys.env.getOrElse("SPARK_GRAFT_REPLAYABLE", "true"))
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
    // dev loop only: SPARK_GRAFT_ONLY=q78,q31 times a subset (exact
    // names; trailing * for prefix); the driver never sets it, so its
    // boards are always the full surface
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def timeOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      // close the timing window BEFORE cache hygiene: unpersisting the
      // query's registered caches is harness bookkeeping, not query work
      val dt = (System.nanoTime() - t0) / 1e9
      // blocks cached by one query must not perturb the next query's
      // memory or timing
      Caches.drain()
      dt
    }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    val results = only.map(_.map(_.trim).filter(_.nonEmpty)).filter(_.nonEmpty) match {
      case Some(tokens) =>
        // dev loop: run in TOKEN order, repeats allowed — the PERF.md
        // sentinel-pair protocol brackets a suspect query with known
        // yardsticks before AND after. Repeated names get a #k suffix
        // so the compact line's JSON keys stay unique.
        val seen = scala.collection.mutable.Map[String, Int]()
        tokens.flatMap(t => sorted.filter { case (n, _) =>
          NameFilter.selected(Some(Seq(t)), n) })
          .map { case (name, fn) =>
            val k = seen.updateWith(name)(c => Some(c.getOrElse(0) + 1)).get
            // suffix INSIDE the short prefix ("q16#2_like_pred") so the
            // compact line's takeWhile('_') shortener keeps it unique
            val label = if (k == 1) name
              else name.takeWhile(_ != '_') + s"#$k" + name.dropWhile(_ != '_')
            label -> timeOne(name, fn)
          }
      case None =>
        val board = sorted.map { case (name, fn) => name -> timeOne(name, fn) }
        // trailing sentinels (default on; SPARK_GRAFT_SENTINELS=0
        // disables): re-time this run's five most expensive rows at the
        // END of the board, keyed "qNN#2". A genuinely slow operator
        // repeats slow; a row that was merely adjacent to a noisy
        // neighbor lands back at its solo band — so every board
        // self-carries the evidence that previously needed a separate
        // sentinel-pair adjudication run. The repeats are extra rows on
        // the board total; their cost is the five hottest queries once
        // more (~15-20% of a full run), paid for not having to re-litigate
        // driver noise round over round.
        if (sys.env.getOrElse("SPARK_GRAFT_SENTINELS", "1") == "0") board
        else {
          val hot = board.sortBy(-_._2).take(5).map(_._1)
          val byName = sorted.toMap
          board ++ hot.map { name =>
            val label = name.takeWhile(_ != '_') + "#2" + name.dropWhile(_ != '_')
            label -> timeOne(name, byName(name))
          }
        }
    }
    println(fullLine(results, sfDir))
    // the machine-parsed compact line is the FINAL stdout write of the
    // process: printed AFTER spark.stop() so no executor-shutdown logging
    // can land between it and EOF, via System.out directly (Console.out
    // could be remapped by a test harness; the driver captures the real
    // process stdout). Only sbt's own "[success]" epilogue follows.
    spark.stop()
    System.out.println(compactLine(results, sfDir))
    System.out.flush()
  }
}
