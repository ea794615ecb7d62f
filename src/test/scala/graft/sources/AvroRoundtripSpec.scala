package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Avro container roundtrip over avro-core (r17, [[AvroRoundtrip]]) —
  * the q44 family's sixth leg. Pins: exact value roundtrip for all
  * five supported types including NULLs, one container per partition
  * (executor-side, no driver data path), by-name field resolution
  * (reader column order independent of writer order), widening reads
  * (long schema over int data), and the loud unsupported-type
  * refusal. */
class AvroRoundtripSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("avro-roundtrip-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("all five types + NULLs roundtrip exactly; one file per partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString + "/t"
    val df = Seq(
      (1, 10L, 1.5, true, "a"),
      (2, 20L, 2.5, false, "b"),
      (3, 30L, 3.5, true, "c")
    ).toDF("i", "l", "d", "b", "s")
      .withColumn("s", org.apache.spark.sql.functions
        .when($"i" === 2, null).otherwise($"s"))
      .repartition(2)
    AvroRoundtrip.write(df, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) === 2,
      "one container per partition")
    // reader schema in a DIFFERENT column order: by-name resolution
    val back = AvroRoundtrip.read(spark, dir, StructType(Seq(
      StructField("s", StringType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("l", LongType))))
    assert(back.collect().map(r => (r.get(1), r.get(4), r.get(2), r.get(3), r.get(0)))
      .toSet === Set((1, 10L, 1.5, true, "a"), (2, 20L, 2.5, false, null),
        (3, 30L, 3.5, true, "c")))
    // widening read: LONG schema over the int column
    val widened = AvroRoundtrip.read(spark, dir, StructType(Seq(
      StructField("i", LongType))))
    assert(widened.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("unsupported column types refuse loudly at write") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_bad").toString
    val e = intercept[IllegalArgumentException] {
      AvroRoundtrip.write(Seq((1, Seq(1, 2))).toDF("k", "arr"), dir)
    }
    assert(e.getMessage.contains("int/long/double/boolean/string"))
  }

  test("task-commit: orphaned attempts are invisible; rewrite cleans them") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_tc").toString + "/t"
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("i", "s").repartition(2)
    AvroRoundtrip.write(df, dir)
    // a failed-then-retried / speculative attempt leaves its .tmp behind;
    // the read glob must never count it
    val orphan = new java.io.File(dir, "part-00099-a7.avro.tmp")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("s", StringType)))
    assert(AvroRoundtrip.read(spark, dir, schema).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    // a rewrite of the directory clears stale orphans AND stale finals
    AvroRoundtrip.write(df, dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".tmp")), s"stale .tmp survived: ${names.toSeq}")
    assert(names.count(_.endsWith(".avro")) === 2, s"got ${names.toSeq}")
    assert(AvroRoundtrip.read(spark, dir, schema).count() === 3)
  }
}
