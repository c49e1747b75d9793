package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.LongVectorDot

/** Optimizer rule: rewrites the stock higher-order-function dot-product
  * idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, v) => acc + v) }}}
  *
  * into the fused native [[LongVectorDot]] when both sides are
  * array<bigint> — user code written in plain Spark idioms gets the
  * codegen'd single-loop implementation (≈5× on the pair-scoring hot path)
  * without changing a line. Injected via graft.GraftExtensions
  * (injectOptimizerRule).
  *
  * Semantics-preserving: LongVectorDot mirrors the HOF idiom exactly —
  * NULL on length mismatch (zip_with null-padding) and on NULL elements,
  * and its failOnError flag (captured from the session's ANSI setting at
  * rewrite time) matches ANSI overflow behavior.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private object MultiplyLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object AddLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a, b), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object ZeroLong {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0L, LongType) => true
      case Cast(Literal(0L, LongType), LongType, _, _) => true
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(left, right, MultiplyLambda()),
          ZeroLong(), AddLambda(), finish)
        if isLongArray(left) && isLongArray(right) && isIdentityFinish(finish) =>
        LongVectorDot(left, right)
    }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a), _) => v.exprId == a.exprId
    case _ => false
  }
}
