package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed, MERGEABLE `Aggregator`
  * (Misra & Gries 1982; mergeability per Agarwal et al., "Mergeable
  * Summaries", PODS'12) — the bounded-memory frequency sketch with a
  * DETERMINISTIC guarantee, complementing the hash-randomized CMS (q99):
  * with k counters, every item whose true frequency exceeds n/k is
  * guaranteed present, and every reported count is an UNDERestimate by
  * at most n/k. No hashing, no probability — the error bound holds on
  * every run.
  *
  * `reduce` is the classic step: increment a tracked key, adopt an
  * untracked key into spare capacity, otherwise decrement ALL counters
  * (dropping zeros) — each decrement "spends" k occurrences, which is
  * where the n/k bound comes from. `merge` sums the two counter maps,
  * then subtracts the (k+1)-largest combined count and drops the
  * non-positive remainder — the PODS'12 merge that preserves the bound,
  * and what makes this a proper partial+final aggregate: map tasks ship
  * k counters per group, never their token streams.
  *
  * Counter VALUES depend on arrival/merge order (only the bound is
  * order-invariant), so queries built on this are rows-only at the
  * driver with the guarantee spec-pinned (the q99/CMS pattern). */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement all; drop exhausted counters (x itself is absorbed
        // by the same decrement: +1 then -1 = not stored)
        b.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-largest count, keep the positive remainder
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, c) => if (c > cut) Some(key -> (c - cut)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
