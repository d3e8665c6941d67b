package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression, GreaterThanOrEqual, Literal, Multiply, Size}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
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
  */
object JaccardBoundRule extends Rule[LogicalPlan] {

  private def sizeD(e: Expression): Expression =
    Cast(Size(e, legacySizeOfNull = false), DoubleType)
  private def bound(a: Expression, b: Expression, t: Double): Expression =
    GreaterThanOrEqual(sizeD(a), Multiply(Literal(t), sizeD(b)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond transform {
        case GreaterThanOrEqual(j: JaccardSorted, lit @ Literal(t: Double, DoubleType))
            if t > 0.0 && !j.bounded =>
          And(
            And(bound(j.left, j.right, t), bound(j.right, j.left, t)),
            GreaterThanOrEqual(j.copy(bounded = true), lit))
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}
