package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.HofVectorDot

/** Optimizer rule (SURVEY.md §7.3 layer (c)): rewrites the declarative
  * higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) }}}
  *
  * (with optional to-double casts on x/y, either operand order in the
  * product and the fold) into the native [[HofVectorDot]] expression.
  * Catalyst evaluates HOF lambdas INTERPRETED, one dispatch per
  * element; the native expression is one generated loop — ~50× on
  * all-pairs similarity workloads (measured in round 1 for VectorDot).
  *
  * The rewrite is sound because [[HofVectorDot]] reproduces the HOF
  * corner semantics exactly (length mismatch → null, null element →
  * null, left-to-right double accumulation) — no non-null/shape
  * guards needed, so SQL/Column users who write the textbook
  * formulation get the engine's hot path for free. One precision
  * guard IS required: the lambda product must be computed in DOUBLE
  * (`product.dataType == DoubleType`). For array<float> inputs an
  * uncast `(x, y) -> x * y` multiplies in float and widens the
  * ROUNDED product, while HofVectorDot multiplies in double — the
  * low bits differ, so that form is left untouched rather than
  * silently changing query output.
  *
  * Injected by [[graft.api.GraftExtensions]] (or
  * `spark.experimental.extraOptimizations` on a live session).
  */
object HofDotRewrite extends Rule[LogicalPlan] {

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** The lambda variable itself, possibly under a cast to double. */
  private def isVar(e: Expression, v: NamedExpression): Boolean = e match {
    case c: Cast if c.dataType == DoubleType => isVar(c.child, v)
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  private def isProductOf(e: Expression, x: NamedExpression, y: NamedExpression): Boolean =
    e match {
      // dataType == DoubleType: a float×float product rounds to float
      // before widening — not the double×double HofVectorDot computes.
      case m: Multiply if m.dataType == DoubleType =>
        (isVar(m.left, x) && isVar(m.right, y)) ||
          (isVar(m.left, y) && isVar(m.right, x))
      case _ => false
    }

  private def isFoldSum(e: Expression, acc: NamedExpression, v: NamedExpression): Boolean =
    e match {
      // IEEE addition is commutative, so either operand order folds to
      // the same bits.
      case a: Add =>
        (isVar(a.left, acc) && isVar(a.right, v)) ||
          (isVar(a.left, v) && isVar(a.right, acc))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(product, Seq(x, y), _)),
          Literal(zero, DoubleType),
          LambdaFunction(merge, Seq(acc, v), _),
          LambdaFunction(finish: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
        if zero == 0.0 &&
          isFloatOrDoubleArray(l) && isFloatOrDoubleArray(r) &&
          isProductOf(product, x, y) &&
          isFoldSum(merge, acc, v) &&
          finish.exprId == facc.exprId =>
      HofVectorDot(l, r)
  }
}
