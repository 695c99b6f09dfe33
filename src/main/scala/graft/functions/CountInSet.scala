package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements that belong to a fixed string set — the native
  * form of `size(filter(tokens, w => w === s1 || w === s2 || ...))`.
  *
  * The higher-order-function form runs interpreted (outside whole-stage
  * codegen) and evaluates the OR-fold per token; language-ID runs five of
  * them per document and quality scoring a sixth, so the lambda interpreter
  * dominated text-analysis profiles. This expression is one generated loop
  * over the token array with a hash-set membership probe per element.
  * Counting semantics are identical to the HOF form: every occurrence
  * counts (not just distinct hits), null elements never match.
  */
object CountInSet {
  def apply(tokens: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(CountInSetExpression(
      GraftSqlBridge.expression(tokens), words))

  /** Interpreted-mode twin of the generated loop. */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

case class CountInSetExpression(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in_set requires ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    CountInSet.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CountInSet.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
