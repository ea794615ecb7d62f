package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-JVM scratch-path isolation (the r2 verdict's top item: two
  * concurrent Verify JVMs at different scale factors must never share a
  * layout path), harness cache hygiene, and the q65 convergence guard. */
class RunEnvSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("every scratch layout path embeds the per-JVM run tag") {
    // the tag is what guarantees two JVMs cannot collide
    assert(RunTag.tag.nonEmpty)
    for (base <- Seq(ops.Advanced.q44Base, sources.SourceQueries.q48Base,
        ops.SkewJoin.q64Base)) {
      assert(base.contains(RunTag.tag), s"$base must embed ${RunTag.tag}")
      assert(base.startsWith(System.getProperty("java.io.tmpdir")))
    }
    // stable within the JVM: re-runs reuse the same path via overwrite
    assert(ops.Advanced.q44Base == ops.Advanced.q44Base)
    // distinct per purpose: q44 and q48 never share a directory
    assert(Set(ops.Advanced.q44Base, sources.SourceQueries.q48Base,
      ops.SkewJoin.q64Base).size == 3)
  }

  test("Caches.drain unpersists every registered cache") {
    import spark.implicits._
    // NOTE: no global-count assertions — suites run concurrently in one
    // JVM and other suites register caches too; assert on our handle only
    val df = Caches.register((1 to 100).toDF("x").cache())
    df.count()
    assert(df.storageLevel != StorageLevel.NONE)
    Caches.drain()
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("Caches.drain unpersists registered checkpoint stores (r19)") {
    import spark.implicits._
    // truncateLineage registers its localCheckpoint RDD: Dataset.unpersist
    // cannot reach RDD-level persists, so the drain must
    val ck = dedup.Dedup.truncateLineage((1 to 100).toDF("x"))
    ck.count() // materialize the lazy checkpoint
    val rdd = ck.queryExecution.logical
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    assert(rdd.getStorageLevel != StorageLevel.NONE)
    Caches.drain()
    assert(rdd.getStorageLevel == StorageLevel.NONE)
  }

  test("retireCheckpoint frees a superseded round's store immediately (r19)") {
    import spark.implicits._
    val ck = dedup.Dedup.truncateLineage((1 to 50).toDF("x"), register = false)
    ck.count()
    val rdd = ck.queryExecution.logical
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
    assert(rdd.getStorageLevel != StorageLevel.NONE)
    dedup.Dedup.retireCheckpoint(ck)
    assert(rdd.getStorageLevel == StorageLevel.NONE)
    // idempotent: the later drain / a second retire is a no-op
    dedup.Dedup.retireCheckpoint(ck)
  }

  test("minLabelClusters converges on a chain and labels by component min") {
    import spark.implicits._
    // two components: chain 1-2-3-4 (diameter 3) and pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val got = dedup.Dedup.minLabelClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
    Caches.drain() // the final label table is registered, not leaked
  }

  test("minLabelClusters fails loudly when maxRounds is exceeded") {
    import spark.implicits._
    // a depth-4 chain cannot fully propagate the min label in 1 round
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      dedup.Dedup.minLabelClusters(pairs, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("maxRounds=1"))
  }
}
