package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** STORAGE-PARTITIONED JOINS (r15): a scan over an identity/bucket
  * partitioned table reports `KeyGroupedPartitioning`
  * ([[JsonDocScan.outputPartitioning]]), so two tables partitioned the
  * same way join with NO SHUFFLE ON EITHER SIDE — the exchange that
  * dominates a fact-fact join at scale is deleted by layout. Pins: the
  * zero-exchange plan for bucket and identity layouts, correctness
  * against the plain recomputation, mismatched-key-set tolerance
  * (push-part-values), and the conservative withdrawal when a file
  * lies outside a decodable partition directory. */
class SpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // storage-partitioned join machinery (off by default)
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
    .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    .appName("spj-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(): String = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    java.nio.file.Files.createTempDirectory("graft_spj").toString
  }

  /** Hash-partitioning exchanges in the FULL plan string — the string
    * renders AQE query-stage contents, which tree traversal does not
    * reach (the PlanQualitySpec idiom). Range exchanges (ORDER BY) are
    * not counted: the join side is the question. */
  private def shuffles(plan: SparkPlan): Int =
    "Exchange hashpartitioning".r.findAllIn(plan.toString).size

  private def executedPlan(sql: String): SparkPlan = {
    val df = spark.sql(sql)
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("bucket-partitioned tables join with zero exchanges, same answer as the plain join") {
    val root = fresh()
    val a = s"graftcat.`$root/a`"
    val b = s"graftcat.`$root/b`"
    spark.sql(s"CREATE TABLE $a (k BIGINT, v DOUBLE) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE $b (k BIGINT, w DOUBLE) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k))")
    import spark.implicits._
    (1L to 40L).map(i => (i, i * 1.0)).toDF("k", "v").writeTo(a).append()
    (1L to 30L).map(i => (i, i * 2.0)).toDF("k", "w").writeTo(b).append()

    val q = s"SELECT a.k, a.v, b.w FROM $a a JOIN $b b ON a.k = b.k ORDER BY a.k"
    // broadcast off: tiny test tables would otherwise BHJ and hide the
    // exchange question entirely — production fact-fact joins can't
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = executedPlan(q)
      assert(shuffles(plan) === 0, // ORDER BY range-exchanges; the JOIN must not hash
        s"expected a storage-partitioned join without join-side shuffles:\n$plan")
      val got = spark.sql(q).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      assert(got.toSeq === (1L to 30L).map(i => (i, i * 1.0, i * 2.0)))

      // the same join WITHOUT the bucketing conf shuffles both sides —
      // proving the zero-exchange plan came from the reported layout
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val plainJoin = executedPlan(q)
      assert(shuffles(plainJoin) >= 2, s"control plan should shuffle:\n$plainJoin")
    } finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("identity-partitioned tables co-join; aggregation on the partition key also skips the shuffle") {
    val root = fresh()
    val a = s"graftcat.`$root/a`"
    spark.sql(s"CREATE TABLE $a (region STRING, v BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region)")
    import spark.implicits._
    Seq(("emea", 1L), ("emea", 2L), ("apac", 3L), ("amer", 4L))
      .toDF("region", "v").writeTo(a).append()
    val agg = s"SELECT region, sum(v) AS s FROM $a GROUP BY region"
    val plan = executedPlan(agg)
    assert(shuffles(plan) === 0,
      s"grouping by the identity partition key must not exchange:\n$plan")
    val got = spark.sql(agg).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("emea" -> 3L, "apac" -> 3L, "amer" -> 4L))
  }

  test("days()-partitioned tables storage-join on the timestamp key") {
    val root = fresh()
    val a = s"graftcat.`$root/a`"
    val b = s"graftcat.`$root/b`"
    spark.sql(s"CREATE TABLE $a (ts STRING, v BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"CREATE TABLE $b (ts STRING, w BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (days(ts))")
    import spark.implicits._
    val ts = for (d <- 1 to 3; h <- Seq("03", "14")) yield f"2024-02-0$d%dT$h:00:00"
    ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }.toDF("ts", "v").writeTo(a).append()
    ts.zipWithIndex.map { case (t, i) => (t, i * 10L) }.toDF("ts", "w").writeTo(b).append()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = s"SELECT a.ts, a.v, b.w FROM $a a JOIN $b b ON a.ts = b.ts"
      val plan = executedPlan(q)
      assert(shuffles(plan) === 0,
        s"a days()-co-partitioned join must not hash-exchange:\n$plan")
      val got = spark.sql(q).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(got === ts.zipWithIndex.map { case (t, i) => (t, i.toLong, i * 10L) }.sorted)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("SPJ composes with merge-on-read DML: the shuffle-free join folds delete vectors") {
    val root = fresh()
    val a = s"graftcat.`$root/a`"
    val b = s"graftcat.`$root/b`"
    spark.sql(s"CREATE TABLE $a (k BIGINT, v DOUBLE) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k)) " +
      "TBLPROPERTIES ('write.rowlevel.mode' = 'merge-on-read')")
    spark.sql(s"CREATE TABLE $b (k BIGINT, w DOUBLE) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k))")
    import spark.implicits._
    (1L to 20L).map(i => (i, i * 1.0)).toDF("k", "v").writeTo(a).append()
    (1L to 20L).map(i => (i, i * 2.0)).toDF("k", "w").writeTo(b).append()
    spark.sql(s"DELETE FROM $a WHERE k % 5 = 0") // DVs inside bucket dirs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = s"SELECT a.k FROM $a a JOIN $b b ON a.k = b.k"
      val plan = executedPlan(q)
      assert(shuffles(plan) === 0, s"MOR DVs must not cost the SPJ plan:\n$plan")
      val got = spark.sql(q).collect().map(_.getLong(0)).toSeq.sorted
      assert(got === (1L to 20L).filterNot(_ % 5 == 0).sorted,
        "delete-vectored rows must not join")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("SPJ under partially-clustered distribution: a skewed side splits without losing the co-partition") {
    val root = fresh()
    val a = s"graftcat.`$root/a`"
    val b = s"graftcat.`$root/b`"
    spark.sql(s"CREATE TABLE $a (k BIGINT, v BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"CREATE TABLE $b (k BIGINT, w BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (bucket(4, k))")
    import spark.implicits._
    // a: heavily skewed onto one key (many files in one bucket);
    // b: small per-key dimension side
    val skewed = (1L to 2000L).map(i => (7L, i)) ++ (1L to 40L).map(i => (i, i))
    skewed.toDF("k", "v").repartition(8).writeTo(a).append()
    (1L to 40L).map(i => (i, i * 10L)).toDF("k", "w").writeTo(b).append()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
    try {
      val q = s"SELECT count(*) AS n, CAST(sum(a.v) AS BIGINT) AS s " +
        s"FROM $a a JOIN $b b ON a.k = b.k"
      val plan = executedPlan(q)
      assert(shuffles(plan) === 0,
        s"partially-clustered SPJ must still avoid the hash exchange:\n$plan")
      val row = spark.sql(q).collect()(0)
      val expN = 2000L + 40L // k=7 duplicates join b's k=7 once each; 1..40 once
      val expS = (1L to 2000L).sum + (1L to 40L).sum
      assert(row.getLong(0) === expN && row.getLong(1) === expS)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled")
    }
  }

  test("a file outside a decodable partition directory withdraws the report, never mis-keys") {
    val root = fresh()
    val a = s"graftcat.`$root/a`"
    spark.sql(s"CREATE TABLE $a (region STRING, v BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region)")
    import spark.implicits._
    Seq(("emea", 1L), ("apac", 2L)).toDF("region", "v").writeTo(a).append()
    // drop a bare legacy file into the table root, bypassing the writer
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(s"$root/a", "legacy.json"),
      """{"region":"amer","v":9}""" + "\n")
    // a bare foreign file is invisible to the manifest-backed listing;
    // bootstrap-adopt it the way the DML path does, via a plain append
    Seq(("emea", 5L)).toDF("region", "v").writeTo(a).append()
    val scan = new JsonDocScan(
      GraftCatalog.readSchema(new java.io.File(s"$root/a")).get,
      s"$root/a", Array.empty)
    val files = JsonDocSource.listDataFiles(s"$root/a")
      .map(f => JsonDocSource.relName(s"$root/a", f))
    if (files.exists(!_.contains("="))) {
      assert(scan.outputPartitioning().isInstanceOf[
        org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning],
        "an unkeyable live file must withdraw the KeyGrouped report")
    } else {
      // the foreign file stayed invisible: the report stands
      assert(scan.outputPartitioning().isInstanceOf[
        org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning])
    }
  }
}
