package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The `aggregate(zip_with(a, b, _*_), 0d, _+_)` formulation is
  * semantically identical but runs INTERPRETED — higher-order-function
  * lambdas sit outside whole-stage codegen, and the ANN/cosine operators
  * evaluate a dot per candidate pair, so the lambda interpreter dominated
  * their profile. This expression generates a plain fused multiply-add
  * loop inside whole-stage codegen instead.
  *
  * Summation order is left-to-right (identical to the lambda fold and to
  * the oracle's `list_dot_product`), so results stay bit-identical to the
  * HOF version. Null handling matches the HOF chain: null array → null,
  * and a LENGTH MISMATCH → null (the `zip_with` pairing would inject a
  * null element and null the fold) — so a truncated/corrupt embedding is
  * excluded by downstream threshold filters instead of scoring a
  * plausible-looking partial dot product. Array ELEMENTS are assumed
  * non-null (embedding columns; a per-element null branch would cost in
  * the ANN hot loop) — the one remaining caller contract.
  */
object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Interpreted-mode twin of the generated loop. Both eval paths return
    * null BEFORE calling this on a length mismatch; looping to x's length
    * (not the min) means a direct caller with ragged arrays fails loudly
    * instead of getting a silent partial sum. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
}

case class DotProductExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two ARRAY<DOUBLE> inputs, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null on length mismatch even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else DotProduct.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != ($b).numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotProduct.compute($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
