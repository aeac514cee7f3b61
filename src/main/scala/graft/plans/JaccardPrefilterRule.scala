package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaccardSortedExpr

/** Catalyst optimizer rule: conjoin the PPJoin-style length prefilter
  * onto Jaccard threshold predicates.
  *
  * `J(A,B) ≥ t` implies `|A∩B| ≤ min(|A|,|B|)` and
  * `|A∪B| ≥ max(|A|,|B|)`, hence `min(|A|,|B|) ≥ t·max(|A|,|B|)` — so
  * `Filter(graft_jaccard_sorted(a,b) ≥ t)` can short-circuit on two
  * O(1) size comparisons before running the O(|A|+|B|) merge pass. On a
  * corpus-scale dedup verification join, candidates with mismatched
  * set sizes (the common case for hash-collision candidates) never pay
  * for the merge.
  *
  * The rewrite is semantics-preserving (the prefilter is implied by the
  * predicate it guards, and null flows identically: null arrays make
  * both the Jaccard and the size compare null). Idempotent under the
  * optimizer's fixed-point batches: already-present conjuncts are
  * detected by `semanticEquals` and never re-added.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule` — the SparkSessionExtensions path for custom
  * whole-plan rewrites (SURVEY §4.3).
  */
object JaccardPrefilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private def sizeAsDouble(e: Expression): Expression =
    Cast(Size(e, legacySizeOfNull = false), DoubleType)

  private def prefiltersFor(j: JaccardSortedExpr, t: Literal): Seq[Expression] = {
    val sa = sizeAsDouble(j.left)
    val sb = sizeAsDouble(j.right)
    Seq(GreaterThanOrEqual(sa, Multiply(t, sb)),
      GreaterThanOrEqual(sb, Multiply(t, sa)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val wanted = conjuncts.flatMap {
        case GreaterThanOrEqual(j: JaccardSortedExpr,
            t @ Literal(v: Double, DoubleType)) if v > 0 =>
          prefiltersFor(j, t)
        case LessThanOrEqual(t @ Literal(v: Double, DoubleType),
            j: JaccardSortedExpr) if v > 0 =>
          prefiltersFor(j, t)
        case _ => Nil
      }
      val missing = wanted.filterNot(p => conjuncts.exists(_.semanticEquals(p)))
      if (missing.isEmpty) f
      else Filter(And(missing.reduce(And), cond), child)
  }
}
