package graft

import org.apache.spark.sql.SparkSession

/** Probe: OPTIMIZE compaction scales with cores (r12 verdict item 3).
  *
  * Stages a jsondoc table of many small files, then times
  * `GraftCatalog.optimize` twice over identical byte content: once with
  * an active SparkSession (bins built in executor tasks) and once with
  * the session deliberately cleared (the serial driver fallback). The
  * two outputs must be byte-identical — the distribution changes WHERE
  * a bin is concatenated, never what it contains — and the distributed
  * pass should approach serial/min(bins, cores).
  *
  * Usage: runMain graft.OptimizeProbe [nFiles] [rowsPerFile] [nBins]
  * Prints one JSON line for PERF.md. */
object OptimizeProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(256)
    val rowsPerFile = args.lift(1).map(_.toInt).getOrElse(20000)
    val nBins = args.lift(2).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def stage(tag: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_optprobe_$tag").toString
      val line = (id: Long) =>
        s"""{"doc_id":$id,"lang":"en","n_chars":${100 + id % 900}}"""
      (0 until nFiles).foreach { i =>
        val sb = new StringBuilder
        (0 until rowsPerFile).foreach(r => sb.append(line(i.toLong * rowsPerFile + r)).append('\n'))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, f"part-$i%05d.jsonl"), sb.toString)
      }
      dir
    }

    // identical content in two directories; bin target sized for nBins
    val dirA = stage("dist")
    val dirB = stage("serial")
    val total = new java.io.File(dirA).listFiles().filter(_.isFile).map(_.length()).sum
    val target = math.max(total / nBins, 1L)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm the scheduler/JIT so the serial leg isn't unfairly cold
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val (_, tDist) = time(sources.GraftCatalog.optimize(dirA, target))
    // serial fallback: clear the active session so optimize takes the
    // driver-side path (same machine, same bytes)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val (_, tSerial) = time(sources.GraftCatalog.optimize(dirB, target))
    SparkSession.setActiveSession(spark)
    SparkSession.setDefaultSession(spark)

    def digest(dir: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val live = sources.JsonDocVersions.latest(dir).map(_._2)
        .getOrElse(Set.empty[String])
      new java.io.File(dir).listFiles()
        .filter(f => f.isFile && live.contains(f.getName))
        .sortBy(_.getName)
        .foreach { f =>
          md.update(f.getName.getBytes("UTF-8"))
          md.update(java.nio.file.Files.readAllBytes(f.toPath))
        }
      md.digest().map("%02x".format(_)).mkString
    }
    // names differ only in tmp provenance — final names are v/bin-keyed
    // and identical across the two paths, so digests must match exactly
    val same = digest(dirA) == digest(dirB)
    assert(same, "distributed and serial OPTIMIZE outputs diverged")

    println(s"""{"probe":"optimize_scaling","n_files":$nFiles,"rows_per_file":$rowsPerFile,""" +
      s""""bins":$nBins,"bytes":$total,"t_distributed_sec":${math.round(tDist * 1000) / 1000.0},""" +
      s""""t_serial_sec":${math.round(tSerial * 1000) / 1000.0},""" +
      s""""speedup":${math.round(tSerial / tDist * 100) / 100.0},"byte_identical":$same}""")
    spark.stop()
  }
}
