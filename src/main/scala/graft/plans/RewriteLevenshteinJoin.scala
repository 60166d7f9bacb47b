package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.{DeletionVariants, MinCommonVariant}

/** Optimizer rule: a cartesian join filtered by `levenshtein(a, b) ≤ 1`
  * (the shape a SQL user naturally writes — and exactly how the reference
  * probes its alias tables, `/root/reference/src/benchmark.py:69-79`)
  * is rewritten into the deletion-neighborhood blocked equi-join of
  * [[graft.operators.SimilarityJoin]]:
  *
  * {{{
  * Filter(lev(a,b) ≤ 1 ∧ rest, Join(L, R, Inner/Cross, cond = None))
  *   ⇒ Project(L.out ++ R.out,
  *       Filter(lev(a,b) ≤ 1 ∧ rest ∧ lv = minCommonVariant(a,b),
  *         Join(Generate(explode(variants(a)), L) as lv,
  *              Generate(explode(variants(b)), R) as rv,
  *              Inner, lv = rv)))
  * }}}
  *
  * Correct for arbitrary inputs: `lev ≤ 1 ⇒ neighborhoods intersect`
  * (completeness), the kept original predicate re-verifies candidates
  * (soundness), and keeping each pair only on its minimal common variant
  * preserves exact row multiplicities without a distinct.
  *
  * Fires only on joins with NO join condition — the pathological cartesian
  * case. Runs in the user-provided optimizer batch, i.e. after pushdown
  * has already moved single-side conjuncts below the join, so `rest` only
  * holds genuinely two-sided predicates.
  */
object RewriteLevenshteinJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** `lev(a,b) ≤ 1` in its comparison spellings (2-arg levenshtein). */
  private def lev1Args(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(1, IntegerType)) => Some((a, b))
    case LessThan(Levenshtein(a, b, None), Literal(2, IntegerType)) => Some((a, b))
    case GreaterThanOrEqual(Literal(1, IntegerType), Levenshtein(a, b, None)) => Some((a, b))
    case GreaterThan(Literal(2, IntegerType), Levenshtein(a, b, None)) => Some((a, b))
    case _ => None
  }

  /** Marker attribute names — injected optimizer rules run inside the
    * operator-optimization fixed point, where PushPredicateThroughJoin can
    * move the (kept) lev predicate into the blocked join's condition on a
    * later iteration; without the guard the rule would re-fire on its own
    * output. */
  private val LvName = "__graft_lv"
  private val RvName = "__graft_rv"
  private def alreadyBlocked(l: LogicalPlan, r: LogicalPlan): Boolean =
    l.output.exists(_.name == LvName) || r.output.exists(_.name == RvName)

  private def sidedLevArgs(
      cond: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    splitConjunctivePredicates(cond).iterator.flatMap { p =>
      lev1Args(p).flatMap { case (x, y) =>
        if (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet))
          Some((x, y))
        else if (y.references.subsetOf(l.outputSet) && x.references.subsetOf(r.outputSet))
          Some((y, x))
        else None
      }
    }.take(1).toList.headOption

  private def rewrite(
      cond: Expression, l: LogicalPlan, r: LogicalPlan,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      a: Expression, b: Expression): LogicalPlan = {
    val lv = AttributeReference(LvName, StringType, nullable = false)()
    val rv = AttributeReference(RvName, StringType, nullable = false)()
    val genL = Generate(Explode(DeletionVariants(a)), Nil, outer = false, None, Seq(lv), l)
    val genR = Generate(Explode(DeletionVariants(b)), Nil, outer = false, None, Seq(rv), r)
    val blocked = Join(genL, genR, Inner, Some(EqualTo(lv, rv)), hint)
    val verify = And(cond, EqualTo(lv, MinCommonVariant(a, b)))
    Project(l.output ++ r.output, Filter(verify, blocked))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // shape 1: the filter still sits above a condition-less join
    case f @ Filter(cond, join @ Join(l, r, Inner | Cross, None, hint))
        if join.resolved && !alreadyBlocked(l, r) =>
      sidedLevArgs(cond, l, r) match {
        case Some((a, b)) => rewrite(cond, l, r, hint, a, b)
        case None => f
      }
    // shape 2: pushdown already folded the predicate into the join
    // condition. Fire only when there is NO equi-conjunct — with one, the
    // planner's hash join on that key already avoids the cartesian.
    case join @ Join(l, r, Inner | Cross, Some(cond), hint)
        if join.resolved && !alreadyBlocked(l, r) && !hasEquiConjunct(cond, l, r) =>
      sidedLevArgs(cond, l, r) match {
        case Some((a, b)) => rewrite(cond, l, r, hint, a, b)
        case None => join
      }
  }

  private def hasEquiConjunct(cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    splitConjunctivePredicates(cond).exists {
      case EqualTo(x, y) =>
        (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
          (y.references.subsetOf(l.outputSet) && x.references.subsetOf(r.outputSet))
      case _ => false
    }
}
