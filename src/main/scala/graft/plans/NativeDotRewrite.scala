package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the composable higher-order dot-product
  * pattern into the native codegen'd [[graft.functions.DotProduct]].
  *
  *   aggregate(zip_with(x, x, (a, b) -> a * b), 0.0, (acc, v) -> acc + v)
  *     ==>  graft_dot(x, x)
  *
  * Users writing the idiomatic HOF formulation get the 8× primitive loop
  * automatically (injected via `graft.GraftExtensions`).
  *
  * Soundness guards — the rewrite fires ONLY when it is semantics
  * preserving:
  *  - both zip_with inputs are the SAME expression (self-dot — norms,
  *    magnitude checks). With distinct inputs of different lengths,
  *    zip_with pads with null and the fold returns null, while a min-
  *    length loop would return a number; same-expression inputs always
  *    have equal length, so no divergence is possible.
  *  - element type is exactly array<double> on both sides.
  *  - the fold's zero is literal 0.0, merge is `acc + v` and finish is
  *    identity, with lambda variables used positionally exactly once.
  *  - null elements: DotProduct returns null, matching the fold
  *    (null * x → null, acc + null → null).
  */
object NativeDotRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(x, y, LambdaFunction(mult: Multiply, zipArgs, _)),
            zero, LambdaFunction(add: Add, mergeArgs, _), finish)
          if isZero(zero) &&
            x.semanticEquals(y) &&
            isDoubleArray(x.dataType) &&
            usesArgsPositionally(mult.left, mult.right, zipArgs) &&
            usesArgsPositionally(add.left, add.right, mergeArgs) &&
            isIdentity(finish) =>
        DotProduct(x, y)
      case other => other
    }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  private def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** f(l, r) must be exactly (args(0), args(1)) by exprId. */
  private def usesArgsPositionally(
      l: Expression, r: Expression, args: Seq[NamedExpression]): Boolean =
    args.length == 2 && ((l, r, args(0), args(1)) match {
      case (lv: NamedLambdaVariable, rv: NamedLambdaVariable,
            a0: NamedLambdaVariable, a1: NamedLambdaVariable) =>
        lv.exprId == a0.exprId && rv.exprId == a1.exprId
      case _ => false
    })

  private def isIdentity(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }
}
