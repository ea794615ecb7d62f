package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Session extensions (SURVEY §2B custom tier (c): `Rule[LogicalPlan]`
  * via `SparkSessionExtensions`): install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
}

/** Optimizer rule: a filter `levenshtein(a, b) <= k` gains the conjunct
  * `abs(length(a) - length(b)) <= k` AHEAD of it. Edit distance is lower-
  * bounded by the length difference, so the guard never changes results —
  * but it is O(1) versus Levenshtein's O(len(a)·len(b)) DP, and
  * conjunction evaluation short-circuits, so rows whose lengths already
  * rule them out (the common case in fuzzy matching over a wide corpus)
  * skip the expensive comparison entirely.
  *
  * The rule joins the optimizer's fixed-point batch, so it must be
  * idempotent: a filter that already contains a length-difference guard
  * (ours or hand-written) is left untouched. */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  /** Is there already a length-difference guard over THESE operands in
    * the condition? Checked per comparison (not filter-wide), so one
    * guarded levenshtein conjunct doesn't suppress the rewrite for a
    * different, unguarded one in the same filter. */
  private def hasGuardFor(cond: Expression, l: Expression, r: Expression): Boolean =
    cond.exists {
      case BinaryComparison(Abs(Subtract(Length(a), Length(b), _), _), _) =>
        (a.semanticEquals(l) && b.semanticEquals(r)) ||
          (a.semanticEquals(r) && b.semanticEquals(l))
      case _ => false
    }

  private def guarded(cmp: Expression, l: Expression, r: Expression): Expression =
    And(cmp.withNewChildren(Seq(Abs(Subtract(Length(l), Length(r))), cmp.children(1))), cmp)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case cmp @ LessThanOrEqual(Levenshtein(l, r, None), Literal(_, IntegerType))
            if !hasGuardFor(cond, l, r) =>
          guarded(cmp, l, r)
        case cmp @ LessThan(Levenshtein(l, r, None), Literal(_, IntegerType))
            if !hasGuardFor(cond, l, r) =>
          guarded(cmp, l, r)
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
