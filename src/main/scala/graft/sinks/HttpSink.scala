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

  /** A failed attempt that is worth retrying: non-2xx responses and
    * connection-level `IOException`s (reset/refused) both land here. */
  final class RetriableFailure(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  /** Bounded linear-backoff retry around one attempt. Retries
    * `RetriableFailure` AND `IOException` — a transient connection reset
    * must not escape the loop on attempt 1 (it previously did); after
    * `maxRetries` re-attempts the last failure propagates, matching the
    * reference's fail-fast error propagation (task.ts:93,106 — a failed
    * run aborts rather than half-publishing). */
  def withRetry[A](maxRetries: Int, backoffMs: Long = 200L)(op: () => A): A = {
    var attempt = 0
    while (true) {
      try return op()
      catch {
        case e @ (_: java.io.IOException | _: RetriableFailure) =>
          if (attempt >= maxRetries) throw e
          attempt += 1
          Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** JDK HttpClient poster: each post rides `withRetry`, so both non-2xx
    * responses and transient connect-level failures get the bounded
    * backoff before the partition's task fails. */
  final class HttpPoster(endpoint: String, maxRetries: Int = 3) extends Poster {
    @transient private lazy val client = HttpClient.newHttpClient()
    def post(body: String): Unit = withRetry(maxRetries) { () =>
      val res = client.send(
        HttpRequest.newBuilder(URI.create(endpoint))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      if (res.statusCode() / 100 != 2)
        throw new RetriableFailure(s"POST $endpoint failed: HTTP ${res.statusCode()}")
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
