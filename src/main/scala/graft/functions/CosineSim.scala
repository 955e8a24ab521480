package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two `array<double>` columns.
  *
  * Semantically identical to the HOF composition
  * `aggregate(zip_with(a,b,*), 0D, +) / (sqrt(...) * sqrt(...))` used by
  * [[graft.operators.Similarity.cosine]] — same ascending-index,
  * left-to-right double accumulation, so results are bit-identical — but
  * fused into ONE codegen'd loop: no zip_with array allocations, no three
  * separate folds, no lambda-variable boxing. This is the hot inner loop of
  * every similarity/ANN operator; at 100 TB the allocation savings dominate.
  *
  * Whole-stage codegen: `doGenCode` emits a plain Java loop over the two
  * `ArrayData`, so the expression inlines into the surrounding generated
  * stage (no virtual `eval` calls per row).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // result can be null (null element / length mismatch) even when both
  // array inputs are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  // A null ELEMENT, a LENGTH MISMATCH, or a ZERO-NORM side makes the whole
  // result null — matching the CASE-guarded HOF composition
  // (Similarity.cosineHof) exactly. NULL is the only sane zero-norm answer
  // in Spark 4: ANSI mode (the 4.x default) makes an unguarded double
  // division by zero THROW DIVIDE_BY_ZERO (verified), non-ANSI would give
  // NaN (which orders ABOVE every real double — zero vectors would
  // out-rank true matches in top-k and pass >= threshold filters), and
  // DuckDB's `/` yields NULL — the oracle-parity answer.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |if (!${ev.isNull}) {
         |  double ${dot}_den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if (${dot}_den == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / ${dot}_den; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column face of the expression. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
