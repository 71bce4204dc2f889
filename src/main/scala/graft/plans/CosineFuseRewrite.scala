package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CosineSim, DotProduct}

/** Optimizer rule: fuse the composed cosine-similarity pattern into the
  * one-pass [[graft.functions.CosineSim]]:
  *
  *   graft_dot(a, b) / (sqrt(graft_dot(a, a)) * sqrt(graft_dot(b, b)))
  *     ==>  graft_cosine(a, b)
  *
  * Together with [[NativeDotRewrite]] (which lifts the HOF fold into
  * graft_dot first), a user writing the fully composable
  * aggregate/zip_with cosine gets the fused primitive loop end-to-end.
  *
  * Soundness: CosineSim accumulates the three sums in the same fold
  * order as the standalone dots and combines them with the identical
  * `ab / (sqrt(aa) * sqrt(bb))` tree, so the rewrite is bit-exact — it
  * can fire under oracle-checked queries without changing hashes.
  * Guards require the numerator/denominator children to be semantically
  * the same `a` and `b` (by canonicalized equality), which also
  * guarantees equal per-row lengths wherever the composed form was
  * well-defined. The norm factors may appear in either order (sqrt(aa)
  * first or sqrt(bb) first) — multiplication of two non-negative
  * doubles is commutative bit-for-bit, so both match.
  */
object CosineFuseRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            DotProduct(a, b),
            Multiply(Sqrt(DotProduct(l1, l2)), Sqrt(DotProduct(r1, r2)), _), _)
          if l1.semanticEquals(l2) && r1.semanticEquals(r2) &&
            ((l1.semanticEquals(a) && r1.semanticEquals(b)) ||
              (l1.semanticEquals(b) && r1.semanticEquals(a))) =>
        CosineSim(a, b)
    }
}
