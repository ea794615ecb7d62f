package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** PER-FILE BLOOM FILTERS (r16, [[JsonDocBlooms]]): opt-in
  * `write.bloom.columns` builds one Bloom per (file, column) at write,
  * and planning drops files whose filter provably excludes every key of
  * an equality/In conjunct — the point-lookup skip min/max bounds cannot
  * make on an unclustered high-cardinality key. Pins: the filter core
  * (no false negatives, fold-union soundness), the files-read << live-
  * files planning proof for point SELECTs and for DELETE-by-id group
  * filtering, OPTIMIZE's rebuilt entries, untouched-file byte identity
  * under a point DELETE, gap conservatism (undeclared tables/columns
  * never prune), and DDL-time declaration validation. */
class BloomSkipSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("bloom-skip-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fresh(props: String = ""): (String, String) = {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING, v DOUBLE) " +
      s"USING `graft-jsondoc`$props")
    (tbl, s"$root/t")
  }

  private val BloomProps =
    " TBLPROPERTIES ('write.bloom.columns' = 'k,tag')"

  /** Append `n` single-file commits; file i holds keys in
    * [i*100, i*100+9] with tags "tag-<k>" — keys are UNCLUSTERED across
    * a wide shared range (every file also gets key spread via v), so
    * min/max ranges overlap and only Blooms can tell files apart. */
  private def fill(tbl: String, n: Int): Unit = {
    import spark.implicits._
    for (i <- 0 until n) {
      // every file spans the whole min/max range [0, n*100+9] via two
      // sentinel rows, so the stats pruner can never skip on k
      val rows = (Seq(0L, n.toLong * 100 + 9) ++ (0 until 8).map(j => i * 100L + j))
        .map(k => (k, s"tag-$k", k * 1.0))
      rows.toDF("k", "tag", "v").coalesce(1).writeTo(tbl).append()
    }
  }

  private def plannedFiles(df: DataFrame): Seq[String] = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.head.inputPartitions.map(_.asInstanceOf[JsonDocPartition].rel)
  }

  private def read(path: String): DataFrame =
    spark.read.format("graft-jsondoc")
      .schema("k BIGINT, tag STRING, v DOUBLE").option("path", path).load()

  test("bloom core: no false negatives; low fp rate; JSON round-trip; rebuild hashing") {
    val hashes = (0L until 5000L).map(JsonDocBlooms.hashLong).toArray
    val b = JsonDocBlooms.build(hashes)
    assert(hashes.forall(JsonDocBlooms.mightContain(b, _)), "no false negatives")
    val absent = (100000L until 102000L).map(JsonDocBlooms.hashLong)
    val fp = absent.count(JsonDocBlooms.mightContain(b, _))
    assert(fp < 100, s"~1% false positives expected, got $fp/2000")
    // the compaction Rebuild hashes tokens exactly as the writer did:
    // integral tokens via hashLong, text via hashConst; a shape
    // mismatch poisons the column; alias fallback covers renamed lines
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val r = new JsonDocBlooms.Rebuild(Seq("k" -> false, "tag" -> true),
      aliases = Map("k" -> Seq("old_k")))
    r.add(mapper.readTree("""{"k": 7, "tag": "x"}"""))
    r.add(mapper.readTree("""{"old_k": 9, "tag": null}"""))
    val parsed = {
      val json = r.toJson
      val node = mapper.readTree(json).get("cols")
      def of(c: String) = {
        val bytes = java.util.Base64.getDecoder.decode(node.get(c).get("bits").asText())
        val bb = java.nio.ByteBuffer.wrap(bytes)
        JsonDocBlooms.Bloom(node.get(c).get("k").asInt(),
          Array.fill(bytes.length / 8)(bb.getLong()))
      }
      (of("k"), of("tag"))
    }
    assert(JsonDocBlooms.mightContain(parsed._1, JsonDocBlooms.hashLong(7L)))
    assert(JsonDocBlooms.mightContain(parsed._1, JsonDocBlooms.hashLong(9L)),
      "pre-rename lines must hash under the current name via the alias")
    assert(JsonDocBlooms.mightContain(parsed._2, JsonDocBlooms.hashConst("x").get))
    assert(!JsonDocBlooms.mightContain(parsed._1, JsonDocBlooms.hashLong(8L)))
    // shape mismatch poisons: a text token in the long column
    val p = new JsonDocBlooms.Rebuild(Seq("k" -> false), Map.empty)
    p.add(mapper.readTree("""{"k": "not-a-number"}"""))
    assert(p.toJson === "", "a lying filter is worse than none")
    // absent token + EXISTS_DEFAULT: the served value must be in the filter
    val dh = JsonDocBlooms.hashConst("legacy").get
    val d = new JsonDocBlooms.Rebuild(Seq("tag" -> true), Map.empty,
      defaults = Map("tag" -> dh))
    d.add(mapper.readTree("""{"k": 1}"""))
    val dNode = mapper.readTree(d.toJson).get("cols").get("tag")
    val dBytes = java.util.Base64.getDecoder.decode(dNode.get("bits").asText())
    val dbb = java.nio.ByteBuffer.wrap(dBytes)
    val dBloom = JsonDocBlooms.Bloom(dNode.get("k").asInt(),
      Array.fill(dBytes.length / 8)(dbb.getLong()))
    assert(JsonDocBlooms.mightContain(dBloom, dh),
      "a line lacking the key reads as the frozen default; the filter must contain it")
  }

  test("point SELECT plans files-read << live-files; an undeclared table scans all") {
    val (tbl, path) = fresh(BloomProps)
    fill(tbl, 12)
    assert(JsonDocVersions.latest(path).get._2.size === 12)
    // long key: lives in exactly one file; ranges overlap everywhere
    val hit = plannedFiles(read(path).filter(col("k") === 305L))
    assert(hit.size <= 2, s"bloom must prune to ~1 of 12 files, planned $hit")
    assert(read(path).filter(col("k") === 305L).count() === 1L)
    // string key through the same gate
    val hitTag = plannedFiles(read(path).filter(col("tag") === "tag-707"))
    assert(hitTag.size <= 2, s"string bloom must prune, planned $hitTag")
    // absent key: every file provably excluded
    assert(plannedFiles(read(path).filter(col("k") === 55L)).isEmpty,
      "an absent key must plan zero files")
    assert(read(path).filter(col("k") === 55L).count() === 0L)
    // IN over two files' keys
    val hitIn = plannedFiles(read(path).filter(col("k").isin(204L, 901L)))
    assert(hitIn.size <= 3, s"In must prune to ~2 of 12 files, planned $hitIn")
    // control: same data, no declaration -> all files planned
    val (tbl2, path2) = fresh()
    fill(tbl2, 12)
    assert(plannedFiles(read(path2).filter(col("k") === 305L)).size === 12,
      "without the property the sentinel-spanned ranges keep every file")
  }

  test("DELETE-by-id rewrites only the matching file; untouched files stay byte-identical") {
    val (tbl, path) = fresh(BloomProps)
    fill(tbl, 10)
    val dir = new java.io.File(path)
    val before = JsonDocVersions.latest(path).get._2.map { rel =>
      rel -> java.nio.file.Files.readAllBytes(new java.io.File(dir, rel).toPath).toSeq
    }.toMap
    spark.sql(s"DELETE FROM $tbl WHERE k = 506")
    val after = JsonDocVersions.latest(path).get._2
    val survivors = after.intersect(before.keySet)
    assert(survivors.size === 9,
      s"exactly one of 10 files is rewritten; live=${after.size}, kept=${survivors.size}")
    survivors.foreach { rel =>
      assert(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, rel).toPath).toSeq === before(rel),
        s"untouched file $rel must keep its exact bytes")
    }
    assert(read(path).filter(col("k") === 506L).count() === 0L)
    assert(read(path).count() === 99L)
  }

  test("OPTIMIZE rebuilds entries in the rewrite tasks: merged files keep pruning exactly") {
    val (tbl, path) = fresh(BloomProps)
    fill(tbl, 8)
    assert(GraftCatalog.optimize(path, targetBytes = 1024 * 1024).isDefined)
    val live = JsonDocVersions.latest(path).get._2
    assert(live.size < 8, "compaction merged the small files")
    // present key: still found (no false negative through the fold)
    assert(read(path).filter(col("k") === 203L).count() === 1L)
    // absent key: the merged file's rebuilt filter still excludes it
    assert(plannedFiles(read(path).filter(col("k") === 55L)).isEmpty,
      "the rebuilt (fold-unioned) filter must keep excluding absent keys")
  }

  test("OPTIMIZE keeps frozen ADD COLUMN defaults findable (r17 advice-high regression)") {
    // lines predating `ADD COLUMN ... DEFAULT` lack the key but READ as
    // the frozen value; a rebuilt bloom that skipped absent tokens would
    // exclude it, so `WHERE col = <default>` would prune the compacted
    // file and the pre-add rows would silently vanish from results
    val (tbl, path) = fresh(BloomProps)
    import spark.implicits._
    for (i <- 0 until 4) { // 4 pre-add single-file commits
      Seq((i * 10L, s"tag-$i", i * 1.0)).toDF("k", "tag", "v")
        .coalesce(1).writeTo(tbl).append()
    }
    spark.sql(s"ALTER TABLE $tbl ADD COLUMNS (src STRING DEFAULT 'legacy')")
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES " +
      "('write.bloom.columns' = 'k,tag,src')")
    Seq((100L, "tag-x", 9.0, "fresh"), (101L, "tag-y", 9.0, "fresh"))
      .toDF("k", "tag", "v", "src").coalesce(1).writeTo(tbl).append()
    assert(GraftCatalog.optimize(path, targetBytes = 1024 * 1024).isDefined)
    assert(JsonDocVersions.latest(path).get._2.size === 1, "all files merged")
    def readAll: DataFrame = spark.read.format("graft-jsondoc")
      .schema("k BIGINT, tag STRING, v DOUBLE, src STRING")
      .option("path", path).load()
    // the pre-add rows still answer an equality probe on the frozen value
    assert(readAll.filter(col("src") === "legacy").count() === 4L,
      "pre-add rows must keep reading (and bloom-matching) the frozen default")
    assert(plannedFiles(readAll.filter(col("src") === "legacy")).nonEmpty)
    assert(readAll.filter(col("src") === "fresh").count() === 2L)
    // absent keys on the same column still prune to zero files
    assert(plannedFiles(readAll.filter(col("src") === "nope")).isEmpty,
      "the defaulted column's rebuilt filter still excludes absent keys")
    // SQL path through the catalog agrees
    assert(spark.sql(s"SELECT count(*) AS n FROM $tbl WHERE src = 'legacy'")
      .collect()(0).getLong(0) === 4L)
  }

  test("streaming appends carry blooms; aggregate pushdown path prunes too") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_s").toString
    val tbl = s"graftcat.`$root/t`"
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, tag STRING, v DOUBLE) " +
      s"USING `graft-jsondoc`$BloomProps")
    import spark.implicits._
    // one batch append (so ranges overlap), then a streaming epoch
    Seq((0L, "z", 0.0), (999L, "z", 0.0), (10L, "a", 1.0))
      .toDF("k", "tag", "v").coalesce(1).writeTo(tbl).append()
    val src = java.nio.file.Files.createTempDirectory("graft_bloom_src").toString
    Seq((0L, "z", 0.0), (999L, "z", 0.0), (500L, "b", 2.0))
      .toDF("k", "tag", "v").coalesce(1).write.mode("append").json(src)
    val q = spark.readStream.schema("k BIGINT, tag STRING, v DOUBLE").json(src)
      .writeStream.format("graft-jsondoc")
      .option("path", s"$root/t")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_bloom_ck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(JsonDocVersions.latest(s"$root/t").get._2.size === 2)
    val planned = plannedFiles(read(s"$root/t").filter(col("k") === 500L))
    assert(planned.size === 1,
      s"the streaming epoch's file carries a bloom and the batch file prunes: $planned")
    // pushed aggregate over a bloom-pruned scan: COUNT(*) with the
    // equality filter plans only the matching file and stays exact
    val agg = spark.sql(
      s"SELECT count(*) AS n FROM graftcat.`$root/t` WHERE k = 500")
    assert(agg.collect()(0).getLong(0) === 1L)
  }

  test("DDL validation: unknown or untypeable bloom columns refuse at declaration") {
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = java.nio.file.Files.createTempDirectory("graft_bloom_ddl").toString
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE graftcat.`$root/a` (k BIGINT) USING `graft-jsondoc` " +
        "TBLPROPERTIES ('write.bloom.columns' = 'nope')")
    }
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE graftcat.`$root/b` (k BIGINT, v DOUBLE) " +
        "USING `graft-jsondoc` TBLPROPERTIES ('write.bloom.columns' = 'v')")
    }
    assert(e2.getMessage.contains("long/int/string"))
    val (tbl, _) = fresh()
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.bloom.columns' = 'ghost')")
    }
    assert(e3.getMessage.contains("unknown column"))
    // valid declaration lands
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.bloom.columns' = 'k')")
  }

  test("gaps keep: pre-declaration files never prune; renaming a declared column refuses") {
    val (tbl, path) = fresh()
    fill(tbl, 3) // no blooms yet
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.bloom.columns' = 'k')")
    import spark.implicits._
    Seq((5000L, "late", 5.0)).toDF("k", "tag", "v").coalesce(1).writeTo(tbl).append()
    // the 3 old files have no entries -> kept; only the new file has one
    val planned = plannedFiles(read(path).filter(col("k") === 103L))
    assert(planned.size === 3, s"stats-less-bloom files must all stay planned: $planned")
    assert(read(path).filter(col("k") === 103L).count() === 1L)
    // renaming (or dropping) a DECLARED column refuses loudly — silently
    // ceasing to build filters would be a quiet performance cliff
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $tbl RENAME COLUMN k TO id")
    }
    assert(e.getMessage.contains("write.bloom.columns"), e.getMessage)
    // retargeting the property first unblocks the rename; old files'
    // old-name bloom entries simply stop being consulted, reads exact
    spark.sql(s"ALTER TABLE $tbl SET TBLPROPERTIES ('write.bloom.columns' = 'tag')")
    spark.sql(s"ALTER TABLE $tbl RENAME COLUMN k TO id")
    val renamed = spark.sql(s"SELECT id FROM $tbl WHERE id = 5000")
    assert(renamed.collect().map(_.getLong(0)).toSeq === Seq(5000L))
  }
}
