package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level contract of the name-watermark offsets (no Spark session:
  * the stream object is driven directly). The streaming-behavior twins
  * live in JsonDocStreamSpec; this pins the one property a running
  * query can't easily observe — the watermark NEVER regresses, even
  * when a fresh instance recovers after the greatest-named consumed
  * file was deleted. */
class JsonDocOffsetSpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("doc_id", LongType)))

  test("recovered offset seeds the watermark: deletion cannot regress it") {
    val dir = Files.createTempDirectory("graft_offset").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "b0.json"),
      """{"doc_id": 1}""".getBytes(StandardCharsets.UTF_8))
    // fresh instance, as after a restart; checkpoint said b1.json was
    // consumed, but that file has since been deleted (only b0 remains)
    val stream = new JsonDocMicroBatchStream(schema, dir, Array.empty)
    stream.deserializeOffset("b1.json")
    // a listing max below the committed name must NOT win: committing
    // "b0.json" back would re-admit names in ("b0.json", "b1.json"]
    assert(stream.latestOffset().json() == "b1.json")
    // new files past the watermark advance it again
    Files.write(Paths.get(dir, "b2.json"),
      """{"doc_id": 2}""".getBytes(StandardCharsets.UTF_8))
    assert(stream.latestOffset().json() == "b2.json")
    // and the batch between the two offsets is exactly the new file
    val parts = stream.planInputPartitions(FileNameOffset("b1.json"), FileNameOffset("b2.json"))
    assert(parts.toSeq.map(_.asInstanceOf[JsonDocPartition].file.split('/').last)
      == Seq("b2.json"))
    // a file APPEARING below the watermark (append-contract violation)
    // is flagged in the log but can never perturb offsets or batches
    Files.write(Paths.get(dir, "a_late.json"),
      """{"doc_id": 9}""".getBytes(StandardCharsets.UTF_8))
    assert(stream.latestOffset().json() == "b2.json")
    assert(stream.planInputPartitions(FileNameOffset("b1.json"), FileNameOffset("b2.json"))
      .toSeq.map(_.asInstanceOf[JsonDocPartition].file.split('/').last) == Seq("b2.json"))
  }

  test("without recovery the watermark starts empty and tracks the listing max") {
    val dir = Files.createTempDirectory("graft_offset2").toFile.getAbsolutePath
    val stream = new JsonDocMicroBatchStream(schema, dir, Array.empty)
    assert(stream.initialOffset().json() == "")
    assert(stream.latestOffset().json() == "") // empty dir
    Files.write(Paths.get(dir, "a.json"),
      """{"doc_id": 1}""".getBytes(StandardCharsets.UTF_8))
    assert(stream.latestOffset().json() == "a.json")
  }
}
