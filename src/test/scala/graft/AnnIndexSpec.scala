package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PERSISTED ANN INDEX (r17, [[graft.sim.AnnIndex]]): IVF postings as a
  * cell-partitioned graft table maintained from the base's change
  * feed. Pins: the persisted search equals the in-memory q55 path
  * row-for-row after a delete+insert fold, refresh is exactly-once
  * (re-CALL is a no-op), refresh work is DELTA-proportional (the MERGE
  * reads O(|delta|) feed rows and touches only matching postings
  * files, never the corpus), the postings scan PLANS only the probed
  * cells' partitions, and the vector string roundtrip is bit-exact. */
class AnnIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("ann-index-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.01"

  test("persisted search == in-memory q55 after the delete+insert fold; no-op re-refresh") {
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val got = sim.Similarity.q227AnnPersisted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ref = sim.Similarity.q55AnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === ref, "the persisted index must reproduce q55 exactly " +
      s"(same pinned fit, same corpus after the fold)\n got=$got\n ref=$ref")
    // the index q227 left behind: find it and re-refresh -> empty range
    val roots = new java.io.File(RunTag.scratch("probe")).getParentFile
    val idx = Option(roots.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s"graft_q227_") &&
        f.getName.endsWith(RunTag.tag) &&
        new java.io.File(f, "idx/_ann_index.json").isFile)
      .maxBy(_.lastModified())
    val (from, to) = sim.AnnIndex.refresh(spark, "graftcat",
      new java.io.File(idx, "idx").getAbsolutePath)
    assert(from > to, s"second refresh must fold nothing: ($from, $to)")
  }

  test("persisted PQ (stored codes) == in-memory q137 after the fold") {
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val got = sim.Similarity.q228AnnPqPersisted(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val ref = sim.Similarity.q137AnnPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got === ref,
      s"stored-code ADC must reproduce q137 exactly\n got=$got\n ref=$ref")
  }

  test("refresh cost is delta-proportional; probe scan plans only probed cells") {
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_ann_delta").toString
    val cat = "graftcat"
    val base = s"$root/base"
    spark.sql(s"CREATE TABLE $cat.`$base` (vec_id BIGINT, vec STRING) " +
      "USING `graft-jsondoc` TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    val full = sim.Similarity.vectors(spark, dir).select(col("vec_id"),
      concat_ws(",", transform(col("v"), x => x.cast("string"))).as("vec"))
    full.writeTo(s"$cat.`$base`").append() // v1: the whole corpus
    val n = full.count()
    val cents = Seq.tabulate(8)(i => Seq.tabulate(64)(j =>
      if (j % 8 == i) 1.0 else 0.0)) // any fixed coarse quantizer works here
    sim.AnnIndex.create(spark, cat, s"$root/idx", base, cents)
    val postings = sim.AnnIndex.postingsPath(s"$root/idx")
    val filesBefore = graft.sources.JsonDocVersions.latest(postings).get._2

    // a SMALL delta: update 10 vectors (MOR: DV-delete + insert rows)
    spark.sql(s"UPDATE $cat.`$base` SET vec = vec WHERE vec_id % 97 = 1 AND vec_id < 970")
    val (f1, t1) = sim.AnnIndex.refresh(spark, cat, s"$root/idx")
    assert(f1 <= t1, "the update must fold")
    // postings row count unchanged (pure upsert), content still complete
    val cnt = spark.sql(s"SELECT count(*) AS c FROM $cat.`$postings`")
      .collect()(0).getLong(0)
    assert(cnt === n, s"upsert fold must keep the corpus complete: $cnt vs $n")
    // DELTA-proportionality: the untouched postings files keep their
    // exact bytes — the MERGE rewrote only files holding matched keys
    val filesAfter = graft.sources.JsonDocVersions.latest(postings).get._2
    val kept = filesAfter.intersect(filesBefore)
    assert(kept.nonEmpty,
      "a 10-row delta must not rewrite every postings file " +
        s"(before=${filesBefore.size}, after=${filesAfter.size}, kept=${kept.size})")

    // partition pruning: a probe over 2 of 8 cells plans only those
    // partitions' files
    val probed = spark.sql(s"SELECT * FROM $cat.`$postings`")
      .where(col("cell").isin(0L, 1L))
    probed.collect()
    val planned = probed.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.length
    val all = spark.sql(s"SELECT * FROM $cat.`$postings`")
    all.collect()
    val allPlanned = all.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.length
    assert(planned < allPlanned,
      s"cell probe must prune partitions: $planned vs $allPlanned")
  }

  test("vector string roundtrip is bit-exact for awkward doubles") {
    import spark.implicits._
    val vals = Seq(1.0E-5, math.Pi, -0.0, 1.7976931348623157E308, 4.9E-324, 0.1)
    val df = Seq((1L, vals.map(_.toString).mkString(","))).toDF("vec_id", "vec")
      .withColumn("v", transform(split(col("vec"), ","), x => x.cast("double")))
    val back = df.select(col("v")).collect()(0).getSeq[Double](0)
    assert(back === vals, s"roundtrip drifted: $back vs $vals")
  }
}
