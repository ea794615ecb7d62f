package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One candidate row of a grouped top-k: (score, id). Ordering is
  * (score DESC, id ASC) — ties break toward the smaller id, the
  * board-wide ranking policy. */
case class Scored(score: Double, id: Long)

/** Bounded top-k as a typed `Aggregator` (SURVEY.md §2B UDF-surface row;
  * the partial-aggregation answer to "top-k PER GROUP at scale").
  *
  * A window `row_number() <= k` computes the same thing but shuffles and
  * SORTS every row of every group; this aggregator keeps a k-bounded
  * sorted buffer, so Spark runs it as a partial+final aggregate — each
  * map task reduces its rows to at most k survivors per group BEFORE the
  * exchange, and the shuffle moves O(k · groups · partitions) buffer
  * rows instead of the corpus. At 100 TB that is the difference between
  * a full-corpus sort shuffle and a bounded merge — the same economics
  * that make TakeOrdered the right global top-k.
  *
  * The buffer invariant (sorted by (score DESC, id ASC), length <= k)
  * makes `reduce` O(1) for the common below-threshold row (compare
  * against the current worst, drop) and O(k) otherwise; `merge` is a
  * bounded merge of two sorted lists. Fully deterministic for distinct
  * (score, id) pairs regardless of partitioning, so callers that feed a
  * ROUNDED score get cross-engine-replayable output (q140). */
class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], x: Scored): Seq[Scored] =
    if (b.length >= k && !beats(x, b.last)) b
    else {
      val i = b.indexWhere(e => beats(x, e)) match {
        case -1 => b.length
        case j  => j
      }
      val grown = (b.take(i) :+ x) ++ b.drop(i)
      if (grown.length > k) grown.take(k) else grown
    }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
    val out = Vector.newBuilder[Scored]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && beats(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[Scored]): Seq[Scored] = r
  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
