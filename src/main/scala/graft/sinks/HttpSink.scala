package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.DataFrame

/** Distributed HTTP POST sink (SURVEY.md §2B sinks row): the scaled form
  * of the reference's collect-and-submit (`task.ts:109-112,189`, which
  * accumulates every feature on one node). Here each partition posts its
  * own bounded batches from the executors — no driver materialization, so
  * output volume scales with the cluster, not the driver heap.
  *
  * Batching bounds request size; `Poster` is a thin trait so tests inject
  * a collector and production injects the JDK HttpClient poster.
  */
object HttpSink {

  trait Poster extends Serializable { def post(body: String): Unit }

  /** JDK HttpClient poster with bounded linear-backoff retry; fail-fast
    * on persistent non-2xx, matching the reference's error propagation
    * (task.ts:93,106 — a failed run aborts rather than half-publishing). */
  final class HttpPoster(endpoint: String, maxRetries: Int = 3) extends Poster {
    @transient private lazy val client = HttpClient.newHttpClient()
    def post(body: String): Unit = {
      var attempt = 0
      var done = false
      while (!done) {
        val res = client.send(
          HttpRequest.newBuilder(URI.create(endpoint))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())
        if (res.statusCode() / 100 == 2) done = true
        else if (attempt >= maxRetries)
          throw new RuntimeException(s"POST $endpoint failed: HTTP ${res.statusCode()}")
        else { attempt += 1; Thread.sleep(200L * attempt) }
      }
    }
  }

  /** POST `df` as JSON-array batches of at most `batchSize` rows, one
    * poster per partition (connection reuse within a partition, no
    * cross-partition coordination). */
  def submitJson(df: DataFrame, poster: Poster, batchSize: Int = 500): Unit =
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach(batch => poster.post(batch.mkString("[", ",", "]")))
    }
}
