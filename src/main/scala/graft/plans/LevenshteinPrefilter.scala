package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a filter `levenshtein(a, b) <= k` gains the implied
  * cheap guard `abs(length(a) - length(b)) <= k` in front of it — edit
  * distance is bounded below by the length difference, so the guard is a
  * pure implication, and short-circuit evaluation then skips the O(|a|·|b|)
  * DP table for most non-matching pairs (in a blocked similarity join the
  * guard is usually the difference between touching every cell and
  * touching a sliver). [[graft.operators.Joins.fuzzyLookup]] writes this
  * guard by hand; the rule gives the same protection to ad-hoc SQL
  * (`WHERE levenshtein(a, b) <= 2`) written without it.
  *
  * Idempotent: conjuncts are split per Filter and the guard is only added
  * when an equivalent one is not already present — re-running the rule
  * (every optimizer iteration does) changes nothing.
  */
object LevenshteinPrefilterRule extends Rule[LogicalPlan] {

  private def lenDiff(lev: Levenshtein): Expression =
    Abs(Subtract(Length(lev.left), Length(lev.right)))

  /** Present-already test by semantic equality (covers both operand
    * orders), so optimizer iterations never stack guards.
    */
  private def hasGuard(conjuncts: Seq[Expression], guard: Expression,
                       swapped: Expression): Boolean =
    conjuncts.exists(c => c.semanticEquals(guard) || c.semanticEquals(swapped))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val guards = conjuncts.flatMap {
        case LessThanOrEqual(lev: Levenshtein, k @ Literal(_, IntegerType))
            if lev.children.length == 2 =>
          val g = LessThanOrEqual(lenDiff(lev), k)
          val gs = LessThanOrEqual(lenDiff(swap(lev)), k)
          if (hasGuard(conjuncts, g, gs)) Nil else Seq(g)
        case LessThan(lev: Levenshtein, k @ Literal(_, IntegerType))
            if lev.children.length == 2 =>
          val g = LessThan(lenDiff(lev), k)
          val gs = LessThan(lenDiff(swap(lev)), k)
          if (hasGuard(conjuncts, g, gs)) Nil else Seq(g)
        case _ => Nil
      }
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduce(And), child)
  }

  private def swap(lev: Levenshtein): Levenshtein =
    lev.copy(left = lev.right, right = lev.left)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
