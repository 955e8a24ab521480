package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.CosineSim

/** Optimizer rule: rewrite the built-in-HOF cosine composition
  *
  * {{{ aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (s,x) -> s+x)
  *     / (sqrt(aggregate(zip_with(a, a, …))) * sqrt(aggregate(zip_with(b, b, …)))) }}}
  *
  * into the fused native [[CosineSim]] expression. Anyone writing the
  * textbook SQL form (including `Similarity.cosineHof` and user queries)
  * gets the single-loop codegen path automatically — no API change.
  * Semantics-preserving: CosineSim reproduces the HOF's left-to-right
  * double fold AND its null-element propagation bit-for-bit.
  *
  * Injected via [[GraftExtensions]] (`injectOptimizerRule`).
  */
object RewriteHofCosine extends Rule[LogicalPlan] {

  private def isMultLambda(l: LambdaFunction): Boolean = l match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      (x.exprId == a1.exprId && y.exprId == a2.exprId) ||
        (x.exprId == a2.exprId && y.exprId == a1.exprId)
    case _ => false
  }

  private def isAddLambda(l: LambdaFunction): Boolean = l match {
    case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      (x.exprId == a1.exprId && y.exprId == a2.exprId) ||
        (x.exprId == a2.exprId && y.exprId == a1.exprId)
    case _ => false
  }

  private def isIdentityLambda(l: LambdaFunction): Boolean = l match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  /** aggregate(zip_with(a, b, *), 0.0, +, identity) over double arrays. */
  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b, m: LambdaFunction),
            Literal(zero: Double, DoubleType), acc: LambdaFunction,
            fin: LambdaFunction)
          if zero == 0.0 && isMultLambda(m) && isAddLambda(acc) &&
            isIdentityLambda(fin) &&
            a.dataType.isInstanceOf[ArrayType] &&
            a.dataType.asInstanceOf[ArrayType].elementType == DoubleType &&
            b.dataType.isInstanceOf[ArrayType] &&
            b.dataType.asInstanceOf[ArrayType].elementType == DoubleType =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(DotProduct(a1, b1),
            Multiply(Sqrt(DotProduct(a2, a3)), Sqrt(DotProduct(b2, b3)), _), _)
          if a2.semanticEquals(a3) && b2.semanticEquals(b3) &&
            a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
        CosineSim(a1, b1)
    }
}
