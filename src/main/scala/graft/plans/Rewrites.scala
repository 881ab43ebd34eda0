package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VectorExprs

/** Library-level optimizer rules, installed alongside the function
  * registry by [[graft.GraftExtensions]] (`injectOptimizerRule`). These
  * run inside Catalyst's operator-optimization batch, so rewrites
  * compose with the builtin rules (constant folding over the rewritten
  * expression, pruning of columns it no longer reads, ...).
  */
object Rewrites {

  /** `vec_dot(x, x)` → `vec_norm2(x)`.
    *
    * The self-dot-product spelling occurs naturally wherever cosine
    * math is written out (`dot(a, b) / sqrt(dot(a, a) * dot(b, b))`);
    * the unary kernel computes the same Σxᵢ² with one array access per
    * element instead of two and drops one child from codegen. Exact
    * semantic twin: both iterate min(|x|,|x|) = |x| elements, both
    * null the result on a null array or null element.
    *
    * `semanticEquals` (canonicalized equality) only holds for
    * DETERMINISTIC children, so `vec_dot(f(), f())` with a
    * non-deterministic `f` — where the two evaluations may genuinely
    * differ — is never rewritten.
    */
  object VecSelfDot extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case VectorExprs.DotProduct(a, b) if a.semanticEquals(b) =>
          VectorExprs.Norm2(a)
      }
  }
}
