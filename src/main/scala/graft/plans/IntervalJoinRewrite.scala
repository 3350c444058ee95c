package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: turn a pure interval theta-join
  * `a JOIN b ON abs(a.x − b.y) <= W` (integral x/y, literal W) into the
  * scalable bucketized form — quantize both sides into W-width buckets,
  * explode the left side into its ≤3 overlapping buckets, EQUI-join on the
  * bucket, and keep the original predicate as an exact post-filter.
  *
  * Why: Spark plans a join with no equi-conjunct as a broadcast nested loop
  * (or cartesian) — O(|A|·|B|) and impossible when both sides are large. The
  * rewritten plan is an ordinary shuffled join on a dense integer key:
  * O(true pairs + bucket collisions), evenly partitioned, AQE-skew-handled.
  * Users write the natural predicate; the engine removes the nested loop.
  * (`join_range_interval` states this rewrite by hand; the rule generalizes
  * it to any query through the extensions-enabled session.)
  *
  * Safety: fires only on INNER joins whose condition has no equi-conjunct
  * (those already hash-join) and exactly one abs-distance conjunct with one
  * side from each input. Bucketing uses floor division built from
  * `(v − pmod(v, W)) div W`, exact for negative values too. Null inputs
  * produce a null bucket → the equi-condition evaluates null → the row drops,
  * identical to the original predicate's null semantics. The original
  * condition is re-checked verbatim after the equi-join, so the rewrite can
  * never widen the result.
  */
object RewriteIntervalJoin extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** Exact floor division (IntegralDivide truncates toward zero; pmod fixes
    * the negative case): floorDiv(v, w) = (v − pmod(v, w)) div w.
    */
  private def floorDiv(v: Expression, w: Expression): Expression =
    new IntegralDivide(new Subtract(v, new Pmod(v, w)), w)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjuncts(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(l, r) =>
          (l.references.subsetOf(left.outputSet) &&
            r.references.subsetOf(right.outputSet)) ||
          (r.references.subsetOf(left.outputSet) &&
            l.references.subsetOf(right.outputSet))
        case _ => false
      }
      // typed literal extraction: a null width literal (e.g. CAST(NULL AS
      // BIGINT), before NullPropagation folds the conjunct) must not match
      def widthOf(l: Literal): Option[Long] = l match {
        case Literal(w: Long, LongType)   => Some(w)
        case Literal(w: Int, IntegerType) => Some(w.toLong)
        case _                            => None
      }
      val interval = if (hasEqui) None else conjuncts.collectFirst {
        case LessThanOrEqual(Abs(Subtract(x, y, _), _), l: Literal)
            if widthOf(l).isDefined &&
              integral(x) && integral(y) && x.deterministic && y.deterministic &&
              x.references.subsetOf(left.outputSet) &&
              y.references.subsetOf(right.outputSet) =>
          (x, y, widthOf(l).get)
        case LessThanOrEqual(Abs(Subtract(x, y, _), _), l: Literal)
            if widthOf(l).isDefined &&
              integral(x) && integral(y) && x.deterministic && y.deterministic &&
              y.references.subsetOf(left.outputSet) &&
              x.references.subsetOf(right.outputSet) =>
          (y, x, widthOf(l).get)
      }
      interval match {
        case Some((lx, ry, wVal)) if wVal > 0 =>
          val w = Literal(wVal, LongType)
          val lv = asLong(lx)
          val rv = asLong(ry)
          // neighbor buckets as floorDiv(lv,W)±1, NOT floorDiv(lv±W,W):
          // identical for W-width buckets, but lv±W can overflow under ANSI
          // for values within W of Long.MIN/MAX while bucket±1 cannot (the
          // bucket magnitude is bounded by |Long.MIN|/W for W>1; W=1 keeps
          // lv itself, same as the original predicate's reach). The three
          // values are always distinct, so no ArrayDistinct is needed and
          // each right row matches at most one exploded bucket — no dup pairs.
          val b = floorDiv(lv, w)
          val one = Literal(1L, LongType)
          val buckets = CreateArray(Seq(
            new Subtract(b, one), b, new Add(b, one)))
          val bucketL = AttributeReference("__graft_bucket", LongType)()
          val leftGen = Generate(Explode(buckets), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(bucketL), child = left)
          val bucketRAlias = Alias(floorDiv(rv, w), "__graft_bucket_r")()
          val rightProj = Project(right.output :+ bucketRAlias, right)
          val newCond = And(EqualTo(bucketL, bucketRAlias.toAttribute), cond)
          Project(j.output,
            Join(leftGen, rightProj, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}
