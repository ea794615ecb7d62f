package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AUTO-COMPACTION (r15, opt-in — `write.autocompact.files`): after a
  * plain append, any partition directory at or above the live-file
  * threshold is compacted inline through the existing partition-scoped
  * OPTIMIZE. Pins: the bound holds under repeated small appends, rows
  * and answers are untouched, compaction commits stay invisible to the
  * change feed (op = optimize), per-directory scoping leaves cold
  * partitions' files alone, and tables without the property never
  * compact. */
class AutocompactSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("autocompact-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_autoc").toString
    (s"graftcat.`$root/t`", s"$root/t")
  }

  private def liveFiles(path: String): Set[String] =
    JsonDocVersions.latest(path).map(_._2).getOrElse(Set.empty)

  test("small appends stay bounded; rows survive; the feed never sees the compactions") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, v DOUBLE) USING `graft-jsondoc` " +
      "TBLPROPERTIES ('write.autocompact.files' = '4')")
    import spark.implicits._
    for (i <- 1 to 12)
      Seq((i.toLong, i * 1.0)).toDF("k", "v").coalesce(1).writeTo(tbl).append()
    assert(liveFiles(path).size < 4,
      s"the live set must stay under the threshold, got ${liveFiles(path)}")
    assert(spark.sql(s"SELECT k FROM $tbl ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === (1L to 12L))
    // every feed row is an insert: the compaction commits emit nothing
    val feed = spark.read.format("graft-jsondoc").option("readChanges", "true")
      .option("path", path).load()
    assert(feed.filter(org.apache.spark.sql.functions
      .col("_change_type") =!= "insert").isEmpty)
    assert(feed.count() === 12L)
  }

  test("per-directory scoping: only the hot partition compacts, cold files stay byte-identical") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (region STRING, k BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region) TBLPROPERTIES ('write.autocompact.files' = '3')")
    import spark.implicits._
    Seq(("cold", 0L)).toDF("region", "k").coalesce(1).writeTo(tbl).append()
    val coldBefore = liveFiles(path).filter(_.startsWith("region=cold/"))
    for (i <- 1 to 6)
      Seq(("hot", i.toLong)).toDF("region", "k").coalesce(1).writeTo(tbl).append()
    val after = liveFiles(path)
    assert(after.count(_.startsWith("region=hot/")) < 3,
      s"the hot directory must compact, got $after")
    assert(after.filter(_.startsWith("region=cold/")) === coldBefore,
      "a cold directory below the threshold must keep its exact files")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 7L)
  }

  test("a declined compaction (singleton bins) backs off instead of re-planning forever") {
    val (tbl, path) = fresh()
    // target-bytes = 1: every file is >= target/2, so OPTIMIZE always packs
    // singleton bins and declines (returns None) — the permanent-no-op shape.
    // The waste case is CROSS-DIRECTORY: every append to a hot partition
    // re-walks all at-threshold directories, so an unchanged cold directory
    // would re-pay the full planning pass (listing + sidecar loads) forever.
    spark.sql(s"CREATE TABLE $tbl (region STRING, k BIGINT) USING `graft-jsondoc` " +
      "PARTITIONED BY (region) TBLPROPERTIES ('write.autocompact.files' = '3', " +
      "'write.autocompact.target-bytes' = '1')")
    import spark.implicits._
    for (i <- 1 to 3)
      Seq(("cold", i.toLong)).toDF("region", "k").coalesce(1).writeTo(tbl).append()
    assert(liveFiles(path).count(_.startsWith("region=cold/")) === 3,
      "nothing compacts under singleton bins")
    def attemptsOn(d: String): Int =
      Option(JsonDocAutocompact.attempts.get((path, s"region=$d/"))).fold(0)(_.toInt)
    val coldAfterFill = attemptsOn("cold")
    assert(coldAfterFill >= 1, "the at-threshold directory was attempted")
    // appends elsewhere must NOT re-plan the unchanged cold directory
    for (i <- 1 to 5)
      Seq(("hot", i.toLong)).toDF("region", "k").coalesce(1).writeTo(tbl).append()
    assert(attemptsOn("cold") === coldAfterFill,
      "an unchanged declined directory must not be re-planned on every append")
    // a change to the cold directory's live set clears the backoff
    Seq(("cold", 99L)).toDF("region", "k").coalesce(1).writeTo(tbl).append()
    assert(attemptsOn("cold") === coldAfterFill + 1,
      "a changed live set must be re-attempted")
    assert(spark.sql(s"SELECT count(*) FROM $tbl").collect()(0).getLong(0) === 9L)
  }

  test("without the property nothing compacts") {
    val (tbl, path) = fresh()
    spark.sql(s"CREATE TABLE $tbl (k BIGINT) USING `graft-jsondoc`")
    import spark.implicits._
    for (i <- 1 to 6)
      Seq(i.toLong).toDF("k").coalesce(1).writeTo(tbl).append()
    assert(liveFiles(path).size === 6)
  }
}
