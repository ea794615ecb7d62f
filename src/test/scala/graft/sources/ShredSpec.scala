package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** JSON SHREDDING AT WRITE (r16, [[JsonDocShred]]): declared typed
  * subcolumns materialize from a raw JSON string column as rows land.
  * Pins: generated-always semantics (an explicit incoming value is
  * replaced — the subcolumn can never drift from its source),
  * typed-strict extraction (shape mismatch / missing / JSON null ->
  * SQL NULL), DDL validation, every writer path (batch, partitioned,
  * MOR insert, streaming epoch), and the payoff: the shredded column
  * feeds the stats/bloom sidecars like a real column, so point lookups
  * on it SKIP FILES — an access path no parse-at-read variant has. */
class ShredSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("shred-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(extraProps: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_shred").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (id BIGINT, props STRING, k_shred BIGINT, " +
      "tag_shred STRING) USING `graft-jsondoc` TBLPROPERTIES " +
      "('write.shred.columns' = 'k_shred=props:$.k, tag_shred=props:$.tag'" +
      extraProps + ")")
    (tbl, s"$root/t")
  }

  test("generated-always: extraction replaces incoming values; typed-strict nulls") {
    val (tbl, _) = fresh()
    spark.sql(s"""INSERT INTO $tbl VALUES
      (1, '{"k": 42, "tag": "a"}', 999, 'LIE'),
      (2, '{"k": "not-int", "tag": 7}', NULL, NULL),
      (3, '{"tag": null}', NULL, NULL),
      (4, NULL, NULL, NULL)""")
    val got = spark.sql(s"SELECT id, k_shred, tag_shred FROM $tbl ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(got === Seq(
      (1L, java.lang.Long.valueOf(42L), "a"), // explicit 999/'LIE' REPLACED
      (2L, null, null), // shape mismatches -> null, both directions
      (3L, null, null), // missing + JSON null
      (4L, null, null))) // null source
  }

  test("every writer path shreds: MOR insert and streaming epochs") {
    val (tbl, path) = fresh(", 'write.rowlevel.mode' = 'merge-on-read'")
    spark.sql(s"""INSERT INTO $tbl VALUES (1, '{"k": 1}', NULL, NULL)""")
    // MOR UPDATE rewrites through the delta insert writer
    spark.sql(s"""UPDATE $tbl SET props = '{"k": 5, "tag": "upd"}' WHERE id = 1""")
    val r = spark.sql(s"SELECT k_shred, tag_shred FROM $tbl").collect()(0)
    assert((r.getLong(0), r.getString(1)) === (5L, "upd"),
      "the rewrite re-extracts from the updated source")
    // streaming epoch append
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_shred_src").toString
    Seq((9L, """{"k": 90, "tag": "s"}""")).toDF("id", "props")
      .coalesce(1).write.mode("append").json(src)
    val q = spark.readStream.schema("id BIGINT, props STRING").json(src)
      .selectExpr("id", "props", "CAST(NULL AS BIGINT) AS k_shred",
        "CAST(NULL AS STRING) AS tag_shred")
      .writeStream.format("graft-jsondoc").option("path", path)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_shred_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.sql(s"SELECT k_shred FROM $tbl WHERE id = 9")
      .collect()(0).getLong(0) === 90L)
  }

  test("the shredded column feeds file skipping: stats prune a point lookup") {
    val (tbl, path) = fresh()
    for (i <- 0 until 6)
      spark.sql(s"INSERT INTO $tbl VALUES " +
        (0 until 5).map(j => s"(${i * 10 + j}, '{\"k\": ${i * 100 + j}}', NULL, NULL)")
          .mkString(", "))
    val live = JsonDocVersions.latest(path).get._2.size
    assert(live >= 6)
    val probe = spark.read.format("graft-jsondoc")
      .schema("id BIGINT, props STRING, k_shred BIGINT, tag_shred STRING")
      .option("path", path).load().filter(col("k_shred") === 301L)
    probe.collect()
    val planned = probe.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.size
    assert(planned <= 2 && planned < live,
      s"k_shred ranges are near-disjoint per file — stats must prune to ~1 of $live, got $planned")
    assert(probe.count() === 1L)
  }

  test("DDL validation refuses unknown/mistyped/self declarations") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_shred_ddl").toString
    def create(n: String, props: String): Unit =
      spark.sql(s"CREATE TABLE graftcat.`$root/$n` (id BIGINT, props STRING, " +
        s"k BIGINT, d DOUBLE) USING `graft-jsondoc` " +
        s"TBLPROPERTIES ('write.shred.columns' = '$props')")
    assert(intercept[Exception] { create("a", "ghost=props:$.k") }
      .getMessage.contains("not a column"))
    assert(intercept[Exception] { create("b", "k=id:$.k") }
      .getMessage.contains("STRING"))
    assert(intercept[Exception] { create("c", "props=props:$.k") }
      .getMessage.contains("differ"))
    assert(intercept[Exception] { create("d", "k=props:$.a.b") }
      .getMessage.contains("top-level"))
    create("ok", "k=props:$.k, d=props:$.d") // valid multi-spec lands
  }
}
