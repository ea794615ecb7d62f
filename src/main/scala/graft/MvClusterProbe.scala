package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: incremental-MV copy-on-write amplification, clustered vs
  * uniform (r12 verdict item 2 — the q183 scaladoc's named hazard,
  * measured). Builds the same view twice — once key-clustered via
  * `GraftCatalog.cluster` (range files), once uniform (hash-sliced
  * appends) — then MERGEs identical localized deltas into both and
  * reports rewritten-files/epoch and wall time per epoch. The folded
  * states are asserted identical: clustering changes the WRITE SET,
  * never the answer.
  *
  * r14 adds a PARTITIONED leg: the view identity-partitioned on a
  * 4-value shard column, then `cluster()`'s partition-local path (the
  * ordered-distribution rewrite) range-clusters user_id WITHIN each
  * directory — a localized delta then rewrites at most one range file
  * per partition (≈4 of nFiles) instead of every file, extending the
  * q188 write-set bound to partitioned MVs.
  *
  * Usage: runMain graft.MvClusterProbe [nUsers] [nFiles] [deltaKeys] [epochs] */
object MvClusterProbe {
  def main(args: Array[String]): Unit = {
    val nUsers = args.headOption.map(_.toInt).getOrElse(400000)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(16)
    val deltaKeys = args.lift(2).map(_.toInt).getOrElse(25000)
    val epochs = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.catalog.graftcat", classOf[sources.GraftCatalog].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def liveSet(path: String): Set[String] =
      sources.JsonDocVersions.latest(path).map(_._2).getOrElse(Set.empty)
    val all = spark.range(nUsers).select($"id".as("user_id"), lit(10L).as("n_events"))

    def mergeEpoch(tbl: String, e: Int): Double = {
      // each epoch's delta is a CONTIGUOUS key window — the localized
      // shape clustering exists for (a uniform delta defeats any layout)
      spark.range(e.toLong * deltaKeys, (e + 1).toLong * deltaKeys)
        .select($"id".as("user_id"), lit(1L).as("n_events"))
        .createOrReplaceTempView("probe_delta")
      val t0 = System.nanoTime()
      spark.sql(s"MERGE INTO $tbl t USING probe_delta d ON t.user_id = d.user_id " +
        "WHEN MATCHED THEN UPDATE SET n_events = t.n_events + d.n_events " +
        "WHEN NOT MATCHED THEN INSERT *")
      (System.nanoTime() - t0) / 1e9
    }

    def run(tag: String, seed: String => Unit): Seq[(Int, Int, Double)] = {
      val root = java.nio.file.Files.createTempDirectory(s"graft_mvprobe_$tag").toString
      val tbl = s"graftcat.`$root/mv`"
      spark.sql(s"CREATE TABLE $tbl (user_id BIGINT, n_events BIGINT) USING `graft-jsondoc`")
      seed(tbl)
      (0 until epochs).map { e =>
        val before = liveSet(s"$root/mv")
        val sec = mergeEpoch(tbl, e)
        // rewritten/total: a full rewrite that also COALESCES the table
        // (epoch 0 on the uniform layout) must still read as 100%
        ((before -- liveSet(s"$root/mv")).size, before.size, sec)
      }
    }

    var tblC: String = null; var tblU: String = null
    val clustered = run("clu", { tbl =>
      tblC = tbl
      all.coalesce(1).writeTo(tbl).append()
      sources.GraftCatalog.cluster(spark, tbl, "user_id", nFiles)
    })
    val uniform = run("uni", { tbl =>
      tblU = tbl
      (0 until nFiles).foreach(r =>
        all.filter($"user_id" % nFiles === r).coalesce(1).writeTo(tbl).append())
    })
    // layout changes the WRITE SET, never the answer
    assert(spark.table(tblC).exceptAll(spark.table(tblU)).isEmpty &&
      spark.table(tblU).exceptAll(spark.table(tblC)).isEmpty,
      "clustered and uniform folds diverged")

    // PARTITIONED leg (r14): 4 identity shards, partition-local range
    // clustering on user_id; the same localized delta spans all shards
    // (shard = user_id % 4 interleaves) but hits ≤ one range file each
    val nShards = 4
    val rootP = java.nio.file.Files.createTempDirectory("graft_mvprobe_part").toString
    val tblP = s"graftcat.`$rootP/mv`"
    spark.sql(s"CREATE TABLE $tblP (user_id BIGINT, shard BIGINT, n_events BIGINT) " +
      s"USING `graft-jsondoc` PARTITIONED BY (shard)")
    all.select($"user_id", ($"user_id" % nShards).as("shard"), $"n_events")
      .writeTo(tblP).append()
    sources.GraftCatalog.cluster(spark, tblP, "user_id", nFiles, path = s"$rootP/mv")
    val partitioned = (0 until epochs).map { e =>
      spark.range(e.toLong * deltaKeys, (e + 1).toLong * deltaKeys)
        .select($"id".as("user_id"), ($"id" % nShards).as("shard"), lit(1L).as("n_events"))
        .createOrReplaceTempView("probe_delta_p")
      val before = liveSet(s"$rootP/mv")
      val t0 = System.nanoTime()
      spark.sql(s"MERGE INTO $tblP t USING probe_delta_p d ON t.user_id = d.user_id " +
        "WHEN MATCHED THEN UPDATE SET n_events = t.n_events + d.n_events " +
        "WHEN NOT MATCHED THEN INSERT (user_id, shard, n_events) " +
        "VALUES (d.user_id, d.shard, d.n_events)")
      val sec = (System.nanoTime() - t0) / 1e9
      ((before -- liveSet(s"$rootP/mv")).size, before.size, sec)
    }
    // the partitioned fold matches the flat ones on the shared columns
    assert(spark.table(tblP).select($"user_id", $"n_events")
      .exceptAll(spark.table(tblC)).isEmpty,
      "partitioned fold diverged from the clustered one")

    // MERGE-ON-READ leg (r14): the uniform worst-case layout that
    // rewrites 100% under copy-on-write rewrites NOTHING under MOR —
    // matched keys land as delete vectors, the per-epoch write cost is
    // O(delta) regardless of layout
    val rootM = java.nio.file.Files.createTempDirectory("graft_mvprobe_mor").toString
    val tblM = s"graftcat.`$rootM/mv`"
    spark.sql(s"CREATE TABLE $tblM (user_id BIGINT, n_events BIGINT) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    (0 until nFiles).foreach(r =>
      all.filter($"user_id" % nFiles === r).coalesce(1).writeTo(tblM).append())
    val mor = (0 until epochs).map { e =>
      val before = liveSet(s"$rootM/mv")
      val sec = mergeEpoch(tblM, e)
      ((before -- liveSet(s"$rootM/mv")).size, before.size, sec)
    }
    assert(mor.forall(_._1 == 0), s"MOR epochs must rewrite zero files, got $mor")
    assert(spark.table(tblM).exceptAll(spark.table(tblC)).isEmpty &&
      spark.table(tblC).exceptAll(spark.table(tblM)).isEmpty,
      "MOR fold diverged from the clustered one")

    def fmt(rs: Seq[(Int, Int, Double)]) = rs.map { case (n, tot, s) =>
      s"""{"rewritten":$n,"of":$tot,"sec":${math.round(s * 100) / 100.0}}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"mv_cluster","users":$nUsers,"files":$nFiles,""" +
      s""""delta_keys":$deltaKeys,"clustered":${fmt(clustered)},"uniform":${fmt(uniform)},""" +
      s""""partitioned":${fmt(partitioned)},"mor":${fmt(mor)}}""")
    spark.stop()
  }
}
