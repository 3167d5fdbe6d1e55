package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: recognize the declarative higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * and substitute the native codegen'd [[DotProduct]] kernel. The fold is
  * sequential left-to-right in both forms and multiplication operand
  * order is FP-irrelevant, so the rewrite is bit-exact — users who write
  * the idiomatic declarative form get the primitive loop (no lambda
  * dispatch, no per-element boxing) without knowing the engine ships one.
  *
  * Registered by [[graft.GraftExtensions]] (deploy path) and usable on a
  * live session via `spark.experimental.extraOptimizations` (the public
  * late-bind hook; see RewriteRuleSpec).
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** (x, y) -> x * y over exactly the two lambda variables, either order */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))
    case _ => false
  }

  /** (acc, v) -> acc + v (either operand order — FP addition commutes) */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(Add(aa, ab, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isVar(aa, acc) && isVar(ab, v)) || (isVar(aa, v) && isVar(ab, acc))
    case _ => false
  }

  /** finish = identity (the default third argument of aggregate()) */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(v: NamedLambdaVariable), _) => isVar(body, v)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(l, r, mul), Literal(0.0, DoubleType), merge, finish)
          if isPairwiseMultiply(mul) && isSum(merge) && isIdentity(finish) =>
        DotProduct(l, r)
    }
}
