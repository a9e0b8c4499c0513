package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: fuse the naive cosine formulation
  * `dot_product(a, b) / (l2_norm(a) * l2_norm(b))` into the single-pass
  * `CosineSim(a, b)` — three array traversals (plus two sqrt/multiply
  * nodes) become one fused loop. Matching is semantic, so aliased or
  * commuted operands fuse too.
  *
  * Numerics are identical (same accumulation order, same final ops);
  * the one behavioral delta is zero-norm input, where the fused form
  * yields NULL instead of an ANSI divide-by-zero error — acceptable
  * for a similarity metric that is undefined there anyway. The fuse
  * requires BOTH operands non-foldable: a literal vector's l2_norm is
  * constant-folded to a number in the same optimizer batch, which
  * removes the L2Norm node the pattern needs — correctly, since the
  * folded divide is already cheaper than a fused loop.
  *
  * Registered by GraftExtensions via `injectOptimizerRule`; the
  * FuseCosineRuleSpec asserts both the rewrite and result equality.
  */
object FuseCosineRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotProduct(a, b), Multiply(L2Norm(x), L2Norm(y), _), _)
          if (a.semanticEquals(x) && b.semanticEquals(y)) ||
             (a.semanticEquals(y) && b.semanticEquals(x)) =>
        CosineSim(a, b)
    }
}
