package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom [[AsOfJoin]] node: Catalyst's builtin
  * PushDownPredicate knows nothing about foreign operators, so a filter above
  * an as-of join would otherwise evaluate post-join — after the shuffle and
  * merge — even when it only touches left-side columns.
  *
  * Only LEFT-side conjuncts push. A right-side predicate above the join
  * filters matched pairs; pushing it below would change WHICH right row is
  * "the latest" (it would re-match to an earlier row instead of dropping the
  * pair) — not an equivalent transformation.
  */
object PushLeftFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val leftAttrs = j.left.outputSet
      val (pushable, kept) = splitConjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(leftAttrs))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left =
          Filter(pushable.reduce(org.apache.spark.sql.catalyst.expressions.And), j.left))
        kept match {
          case Nil => pushed
          case ks => Filter(ks.reduce(org.apache.spark.sql.catalyst.expressions.And), pushed)
        }
      }
  }
}
