package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, Add, And, Cast,
  Expression, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual,
  Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: bounded-edit-distance predicates get a free length
  * prefilter.
  *
  * `levenshtein(a, b) <= k` runs an O(|a|·|b|) dynamic program per row,
  * but edit distance is bounded below by the length difference:
  * `|len(a) - len(b)| <= dist`. The rule rewrites
  * `Filter(levenshtein(a,b) <= k)` to
  * `Filter(|len(a)-len(b)| <= k + 1 AND levenshtein(a,b) <= k)` — the
  * cheap O(1) guard short-circuits the DP for every pair whose lengths
  * already rule the match out (the dominant case in fuzzy joins), and
  * Catalyst may push the guard further down on its own. The `+ 1` slack
  * makes the double-cast comparison sound for ANY numeric `k` type (a
  * decimal k that rounds down a ulp under the cast can never lose a
  * matching row). q117 writes this guard by hand; with the rule
  * installed, plain `levenshtein(a,b) <= k` filters get it for free.
  *
  * Sound only for UPPER bounds (`<=`, `<`, and the flipped `k >= lev`);
  * lower-bound predicates are left untouched. Idempotent: a guard that
  * is already present (semantically) is not added again, so the rule is
  * safe under the fixed-point batch `experimental.extraOptimizations`
  * runs in.
  */
object EditDistancePrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def guard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(
      Cast(Abs(Subtract(Length(a), Length(b))), DoubleType),
      Add(Cast(k, DoubleType), Literal(1.0)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap {
        case LessThanOrEqual(Levenshtein(a, b, None), k)
            if k.deterministic => Some(guard(a, b, k))
        case LessThan(Levenshtein(a, b, None), k)
            if k.deterministic => Some(guard(a, b, k))
        case GreaterThanOrEqual(k, Levenshtein(a, b, None))
            if k.deterministic => Some(guard(a, b, k))
        case _ => None
      }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
      if (guards.isEmpty) f
      else Filter(And(guards.reduce(And), cond), child)
  }
}
