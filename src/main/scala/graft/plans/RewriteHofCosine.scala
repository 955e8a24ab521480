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
  * into the fused native [[CosineSim]] expression — with or without the
  * `nullif(denominator, 0)` zero-norm guard (`Similarity.cosineHof` emits
  * the guarded form). Anyone writing the textbook SQL form gets the
  * single-loop codegen path automatically — no API change.
  *
  * Semantics: CosineSim reproduces the HOF's left-to-right double fold and
  * null-element propagation bit-for-bit, and returns NULL on a zero-norm
  * side. For the GUARDED form that is exactly the input's semantics. For
  * the PLAIN form, Spark 4's ANSI default makes the raw division THROW
  * DIVIDE_BY_ZERO on a zero-norm vector (non-ANSI: NaN) — the rewrite
  * softens that to NULL, `try_divide`-style (and NULL is what DuckDB's
  * `/` yields). Recorded here and in DIVERGENCES #18 rather than
  * silently; pinned by VectorOpsSpec.
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

  /** sqrt(dot(a,a)) * sqrt(dot(b,b)) — the norm-product denominator. */
  private object NormProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Multiply(Sqrt(DotProduct(a2, a3)), Sqrt(DotProduct(b2, b3)), _)
          if a2.semanticEquals(a3) && b2.semanticEquals(b3) =>
        Some((a2, b2))
      case _ => None
    }
  }

  private def isZeroLit(e: Expression): Boolean = e match {
    case Literal(0.0d, DoubleType) => true
    case _ => false
  }

  private def isNullLit(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // plain form (NaN-on-zero-norm input; rewrite stricten-s to NULL — doc)
      case Divide(DotProduct(a1, b1), NormProduct(a2, b2), _)
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
        CosineSim(a1, b1)
      // zero-guarded form: CASE WHEN den = 0 THEN NULL ELSE dot/den END
      // (what Similarity.cosineHof emits; CaseWhen with one branch)
      case CaseWhen(Seq((EqualTo(x1, z), nl)),
            Some(Divide(DotProduct(a1, b1), x2, _)))
          if isZeroLit(z) && isNullLit(nl) && x1.semanticEquals(x2) &&
            (x2 match {
              case NormProduct(a2, b2) =>
                a1.semanticEquals(a2) && b1.semanticEquals(b2)
              case _ => false
            }) =>
        CosineSim(a1, b1)
    }
}
