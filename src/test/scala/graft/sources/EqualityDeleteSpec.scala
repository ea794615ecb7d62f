package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** EQUALITY DELETES / STREAMING UPSERT (r15, the r14 verdict's item 2):
  * `writeStream ... .option("upsert-keys", "k")` turns each epoch into
  * a keyed upsert — new rows land as ordinary files, ONE `_eq-*` file
  * deletes their keys from every EARLIER file (addedAt sequencing), so
  * the table reads as the per-key last image with no base-table scan
  * per epoch. `upsert-cdc-col` marks 'D' rows as delete-only. Pins:
  * last-wins reads, CDC deletes, exactly-once across restart, DV
  * coexistence, OPTIMIZE purge + re-streamability, vacuum sweep, time
  * travel reading each version's own eq state, and the loud refusals
  * (streaming a live-upsert table; null keys). */
// top-level: Spark's encoder derivation cannot instantiate inner
// classes of a test suite (no outer-scope access executor-side)
case class EqCdc(k: Long, v: Double, op: String)
case class EqNullableKey(k: Option[Long], v: Double)
case class EqPCdc(k: Long, cat: String, v: Double, op: String)

class EqualityDeleteSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("eqdelete-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_eq").toString

  private def readBack(path: String): Map[Long, Double] = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    spark.read.format("graft-jsondoc").schema(schema).option("path", path).load()
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Run a sequence of CDC batches through the upsert sink, one epoch
    * each (MemoryStream + processAllAvailable per batch). */
  private def runEpochs(path: String, ckpt: String, batches: Seq[Seq[EqCdc]]): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EqCdc]
    val q = mem.toDF().writeStream.format("graft-jsondoc")
      .option("path", path)
      .option("checkpointLocation", ckpt)
      .option("upsert-keys", "k")
      .option("upsert-cdc-col", "op")
      .start()
    try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
  }

  test("keyed upsert stream: last image wins, CDC deletes drop, inserts land") {
    val path = freshDir()
    val ckpt = freshDir()
    runEpochs(path, ckpt, Seq(
      Seq(EqCdc(1, 10.0, "I"), EqCdc(2, 20.0, "I"), EqCdc(3, 30.0, "I")), // epoch 0
      Seq(EqCdc(2, 22.0, "U"), EqCdc(4, 40.0, "I")),                    // epoch 1
      Seq(EqCdc(1, 0.0, "D"), EqCdc(3, 33.0, "U"))))                    // epoch 2
    assert(readBack(path) === Map(2L -> 22.0, 3L -> 33.0, 4L -> 40.0))
    // the op column is protocol, never stored
    val raw = JsonDocSource.listDataFiles(path)
      .flatMap(f => scala.io.Source.fromFile(f, "UTF-8").getLines())
    assert(raw.forall(!_.contains("\"op\"")), "the CDC op column leaked into storage")
    // eq files exist and are manifest-referenced
    val (eqs, _) = JsonDocVersions.eqsFor(path, None)
    assert(eqs.nonEmpty, "epochs must have committed equality deletes")
    // pushed aggregation folds them too: COUNT(*) through the source
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val cnt = spark.read.format("graft-jsondoc").schema(schema)
      .option("path", path).load().groupBy().count().collect()(0).getLong(0)
    assert(cnt === 3L, "agg pushdown must fold equality deletes")
  }

  test("restart replays exactly-once: no duplicate rows, no self-deleted epochs") {
    // file-driven source (MemoryStream cannot restart from a checkpoint):
    // graft-jsondoc SOURCE -> upsert SINK, stop, restart with new input
    val src = freshDir()
    val path = freshDir()
    val ckpt = freshDir()
    val cdcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType)))
    def writeIn(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(src, name),
        lines.mkString("", "\n", "\n"))
    def start() = spark.readStream.format("graft-jsondoc").schema(cdcSchema)
      .option("path", src).load()
      .writeStream.format("graft-jsondoc")
      .option("path", path).option("checkpointLocation", ckpt)
      .option("upsert-keys", "k").option("upsert-cdc-col", "op")
      .start()
    writeIn("b0.jsonl", Seq(
      """{"k":1,"v":10.0,"op":"I"}""", """{"k":2,"v":20.0,"op":"I"}"""))
    val q1 = start()
    try {
      q1.processAllAvailable()
      writeIn("b1.jsonl", Seq("""{"k":1,"v":11.0,"op":"U"}"""))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(readBack(path) === Map(1L -> 11.0, 2L -> 20.0))
    val (eqsBefore, _) = JsonDocVersions.eqsFor(path, None)
    // restart from the same checkpoint with one more batch: any replayed
    // window must not re-commit (the ledger guard), the new epoch
    // applies once, and NO eq file may re-sequence above its own rows
    writeIn("b2.jsonl", Seq(
      """{"k":2,"v":0.0,"op":"D"}""", """{"k":5,"v":50.0,"op":"I"}"""))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(readBack(path) === Map(1L -> 11.0, 5L -> 50.0),
      "restart duplicated, lost, or self-deleted committed epochs")
    val (eqsAfter, _) = JsonDocVersions.eqsFor(path, None)
    assert(eqsAfter.length === eqsBefore.length + 1,
      "a replayed epoch must never re-write its equality delete at a later version")
  }

  test("time travel reads each version's own eq state; rollback restores it") {
    val path = freshDir()
    runEpochs(path, freshDir(), Seq(
      Seq(EqCdc(1, 10.0, "I"), EqCdc(2, 20.0, "I")), // v1
      Seq(EqCdc(1, 99.0, "U"))))                   // v2: eq(1) + new image
    val v1 = 1
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val atV1 = spark.sql(s"SELECT k, v FROM graftcat.`$path` VERSION AS OF $v1")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(atV1 === Map(1L -> 10.0, 2L -> 20.0),
      "the pre-upsert snapshot must read WITHOUT the later eq delete")
    assert(readBack(path) === Map(1L -> 99.0, 2L -> 20.0))
    // rollback to v1 restores the eq-free state as a new commit
    GraftCatalog.rollback(path, v1)
    assert(readBack(path) === Map(1L -> 10.0, 2L -> 20.0))
  }

  test("OPTIMIZE purges equality deletes; the compacted table streams again; vacuum sweeps eq files") {
    val path = freshDir()
    runEpochs(path, freshDir(), Seq(
      Seq(EqCdc(1, 10.0, "I"), EqCdc(2, 20.0, "I"), EqCdc(3, 30.0, "I")),
      Seq(EqCdc(2, 22.0, "U"), EqCdc(3, 0.0, "D"))))
    assert(readBack(path) === Map(1L -> 10.0, 2L -> 22.0))
    // a live-upsert table refuses file-granular streaming, loudly
    val refuse = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
      val q = spark.readStream.format("graft-jsondoc").schema(schema)
        .option("path", path).load()
        .writeStream.format("memory").queryName("eq_refuse")
        .option("checkpointLocation", freshDir())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    assert(Iterator.iterate(refuse: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("equality"))))
    // compaction applies the eqs, outputs re-sequence, entries GC
    val v = GraftCatalog.optimize(path, targetBytes = 1L << 20)
    assert(v.isDefined)
    assert(JsonDocVersions.eqsFor(path, None)._1.isEmpty,
      "compaction must retire every folded equality delete")
    assert(readBack(path) === Map(1L -> 10.0, 2L -> 22.0),
      "the purge must preserve the upserted image bit-for-bit")
    // row estimate is exact again post-purge; streaming works again
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val q2 = spark.readStream.format("graft-jsondoc").schema(schema)
      .option("path", path).load()
      .writeStream.format("memory").queryName("eq_ok")
      .option("checkpointLocation", freshDir())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q2.awaitTermination() finally q2.stop()
    assert(spark.table("eq_ok").count() === 2L)
    // vacuum sweeps the no-longer-referenced eq files
    GraftCatalog.vacuum(path, keepLast = 1)
    val leftoverEq = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(JsonDocEqDeletes.Prefix))
    assert(leftoverEq.isEmpty, s"vacuum left orphan eq files: ${leftoverEq.mkString(", ")}")
  }

  test("partitioned upsert: a key MOVES across partition directories; eq deletes follow it") {
    // the case position deletes cannot express without a read-before-
    // write: the upserted image lands in a DIFFERENT directory than the
    // old image, and the key-level delete still erases the old one
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set("spark.sql.catalog.graftcat", classOf[GraftCatalog].getName)
    val root = freshDir()
    val path = s"$root/t"
    spark.sql(s"CREATE TABLE graftcat.`$path` (k BIGINT, cat STRING, v DOUBLE) " +
      "USING `graft-jsondoc` PARTITIONED BY (cat)")
    Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 30.0)).toDF("k", "cat", "v")
      .coalesce(1).writeTo(s"graftcat.`$path`").append()
    val mem = MemoryStream[EqPCdc]
    val q = mem.toDF().writeStream.format("graft-jsondoc")
      .option("path", path).option("checkpointLocation", freshDir())
      .option("upsert-keys", "k").option("upsert-cdc-col", "op")
      .start()
    try {
      mem.addData(EqPCdc(2, "b", 22.0, "U"), EqPCdc(3, "c", 33.0, "U")) // both MOVE
      q.processAllAvailable()
      mem.addData(EqPCdc(1, "a", 0.0, "D"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.sql(s"SELECT k, cat, v FROM graftcat.`$path` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((2L, "b", 22.0), (3L, "c", 33.0)),
      "moved keys must read at their new partition only; deleted keys vanish")
    // the new images routed into their partition directories on disk
    assert(new java.io.File(path, "cat=b").isDirectory &&
      new java.io.File(path, "cat=c").isDirectory)
    // partition pruning on the NEW location finds the moved row
    val pruned = spark.sql(s"SELECT k FROM graftcat.`$path` WHERE cat = 'c'")
      .collect().map(_.getLong(0)).toSeq
    assert(pruned === Seq(3L))
    // compaction purges per-partition; the answer is unchanged
    GraftCatalog.optimize(path, targetBytes = 1L << 20)
    assert(JsonDocVersions.eqsFor(path, None)._1.isEmpty)
    val after = spark.sql(s"SELECT k, cat, v FROM graftcat.`$path` ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(after === rows)
  }

  test("null upsert keys are refused loudly; keys must exist in the stream schema") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = freshDir()
    val mem = MemoryStream[EqNullableKey]
    val q = mem.toDF().writeStream.format("graft-jsondoc")
      .option("path", path).option("checkpointLocation", freshDir())
      .option("upsert-keys", "k").start()
    mem.addData(EqNullableKey(None, 1.0))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("NULL"))), e.getMessage)
    // an unknown key column refuses at the first epoch's planning (the
    // write builder runs on the stream thread, so the error surfaces
    // through the query, not at start())
    val mem2 = MemoryStream[EqNullableKey]
    val q2 = mem2.toDF().writeStream.format("graft-jsondoc")
      .option("path", freshDir()).option("checkpointLocation", freshDir())
      .option("upsert-keys", "nope").start()
    mem2.addData(EqNullableKey(Some(1L), 1.0))
    val bad = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    assert(Iterator.iterate(bad: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("upsert-keys"))), bad.getMessage)
  }
}
