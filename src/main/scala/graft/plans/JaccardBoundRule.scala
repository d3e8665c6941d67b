package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThanOrEqual, Literal, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a Jaccard threshold implies a set-size bound —
  * |A∩B| / |A∪B| >= t  forces  |A| >= t*|B|  and  |B| >= t*|A|
  * (the intersection is at most the smaller set, the union at least the
  * larger). The rule conjoins that O(1) size test in front of the O(n)
  * merge, so wildly mismatched candidate pairs short-circuit before the
  * Jaccard evaluates. Injected via GraftExtensions (injectOptimizerRule);
  * the predicate is only strengthened with an implied condition, so
  * results are provably unchanged. The `bounded` flag on JaccardSorted
  * keeps the rewrite idempotent across optimizer passes.
  *
  * Matches the threshold wherever the fixed-point batch leaves it: in a
  * standalone Filter OR already merged into a Join condition — the dedup
  * verify's `where(jaccard >= t)` over its join-back is pushed into the
  * join by PushPredicateThroughJoin inside the same batch, so a
  * Filter-only match would never fire on the real plans.
  */
object JaccardBoundRule extends Rule[LogicalPlan] {

  private def sizeD(e: Expression): Expression =
    Cast(Size(e, legacySizeOfNull = false), DoubleType)
  private def bound(a: Expression, b: Expression, t: Double): Expression =
    GreaterThanOrEqual(sizeD(a), Multiply(Literal(t), sizeD(b)))

  private def rewrite(cond: Expression): Expression = cond transform {
    case GreaterThanOrEqual(j: JaccardSorted, lit @ Literal(t: Double, DoubleType))
        if t > 0.0 && !j.bounded =>
      And(
        And(bound(j.left, j.right, t), bound(j.right, j.left, t)),
        GreaterThanOrEqual(j.copy(bounded = true), lit))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val rewritten = rewrite(cond)
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
    case j: Join if j.condition.isDefined =>
      val rewritten = rewrite(j.condition.get)
      if (rewritten fastEquals j.condition.get) j
      else j.copy(condition = Some(rewritten))
  }
}
