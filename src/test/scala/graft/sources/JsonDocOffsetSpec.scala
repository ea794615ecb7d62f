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

  test("streaming epoch commit is idempotent: retry and cross-run replay never duplicate") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    val dir = Files.createTempDirectory("graft_epoch").toFile.getAbsolutePath
    def row(v: Long) = new GenericInternalRow(Array[Any](v))
    def visible = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".")).map(_.getName).sorted.toSeq

    val w1 = new JsonDocStreamingWrite(dir, schema, "runA")
    val dw = w1.createStreamingWriterFactory(null).createWriter(0, 100L, 3L)
    dw.write(row(1L))
    val msg = dw.commit()
    w1.commit(3L, Array(msg))
    val afterFirst = visible
    assert(afterFirst.length == 1 && afterFirst.head.contains("e00003"))

    // driver retries the SAME commit (temp already renamed): recognized
    // as already-committed, no throw, no second file
    w1.commit(3L, Array(msg))
    assert(visible == afterFirst)

    // restarted run (new queryId, new taskId) REPLAYS epoch 3: the final
    // name is run-independent, so the replay replaces the file in place
    val w2 = new JsonDocStreamingWrite(dir, schema, "runB")
    val dw2 = w2.createStreamingWriterFactory(null).createWriter(0, 200L, 3L)
    dw2.write(row(1L))
    w2.commit(3L, Array(dw2.commit()))
    assert(visible == afterFirst, "cross-run replay duplicated the epoch")
    val content = new String(Files.readAllBytes(
      Paths.get(dir, afterFirst.head)), StandardCharsets.UTF_8)
    assert(content.trim == """{"doc_id":1}""")

    // a commit where NEITHER temp nor final exists is a hard error, not
    // a silent data hole
    intercept[java.io.IOException] {
      w1.commit(9L, Array(JsonDocCommitMessage(".nope.tmp", "part-e00009-p00000.jsonl")))
    }
  }

  test("runtime In filter drops non-joining lines at the reader (row-level DPP)") {
    val dir = Files.createTempDirectory("graft_rtf").toFile.getAbsolutePath
    Files.write(Paths.get(dir, "r0.jsonl"),
      (1L to 10L).map(i => s"""{"doc_id":$i}""").mkString("\n")
        .getBytes(StandardCharsets.UTF_8))
    val scan = new JsonDocScan(schema, dir, Array.empty)
    // Spark delivers the build side's distinct keys before readers open
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("doc_id", Array(3L, 7L, 99L))))
    val reader = scan.createReaderFactory()
      .createReader(scan.planInputPartitions().head)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (reader.next()) got += reader.get().getLong(0)
    assert(got.toSeq == Seq(3L, 7L), "reader must emit only the joining keys")
    // an unevaluable runtime shape is ignored, never misapplied
    val scan2 = new JsonDocScan(schema, dir, Array.empty)
    scan2.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.StringContains("doc_id", "x")))
    val r2 = scan2.createReaderFactory().createReader(scan2.planInputPartitions().head)
    var n = 0
    while (r2.next()) n += 1
    assert(n == 10, "ignored runtime filter must not drop rows")
  }
}
