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
  * HOF version. Null handling matches the HOF chain on whole-column nulls
  * (null array → null); arrays are assumed non-null-elemented and
  * equal-length (embedding columns are fixed-dim) — extra elements on one
  * side are ignored like `zip_with` would pair them with null and the sum
  * would go null, which never occurs for the fixed-dim embedding data this
  * serves.
  */
object DotProduct {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Interpreted-mode twin of the generated loop. */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
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

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
