package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 31-ary polynomial rolling hash over a string's Unicode code points,
  * reduced mod 2^20 at every step — the DSIR bucket hash
  * ([[graft.operators.TextAnalysis.dsirWeights]]).
  *
  * Value contract (pinned by the DuckDB oracle twin, which folds
  * `unicode(c)` over `split(s, '')`):
  *
  * {{{ h_0 = 0;  h_i = (h_{i-1} * 31 + codePoint_i) mod 2^20 }}}
  *
  * i.e. `java.lang.String.hashCode` with a 2^20 modulus instead of
  * 32-bit wraparound. The same value was previously produced by an
  * interpreted per-character SQL fold
  * (`aggregate(sequence(1, length(s)), …, ascii(substring(s, i, 1)))`),
  * which rebuilt a substring object per character per row and dominated
  * the dsir_weights query's cost; this native [[UnaryExpression]] walks
  * the UTF-8 bytes once with no allocation and stays inside whole-stage
  * codegen (a static-method call, like [[Crc32Q]]).
  *
  * ASCII fast path: code points < 0x80 are single UTF-8 bytes, so the
  * fold reads bytes directly until it meets a high bit, then falls back
  * to full code-point decoding for the remainder (fixture invariants pin
  * ASCII-only text, but the contract holds for any string).
  */
object PolyHash31 {
  final val Mod: Long = 1048576L // 2^20

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var a = 0L
    var i = 0
    val n = bytes.length
    while (i < n && bytes(i) >= 0) { // ASCII fast path
      a = (a * 31L + bytes(i)) % Mod
      i += 1
    }
    if (i < n) { // non-ASCII remainder: decode code points
      val str = UTF8String.fromBytes(bytes, i, n - i).toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        a = (a * 31L + cp) % Mod
        j += Character.charCount(cp)
      }
    }
    a
  }

  /** Column API: `polyHash31(col)` → LONG in [0, 2^20). */
  def apply(c: Column): Column =
    GraftSqlBridge.column(PolyHash31Expression(GraftSqlBridge.expression(c)))
}

case class PolyHash31Expression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash31 requires STRING input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash31"

  override def nullSafeEval(input: Any): Any =
    PolyHash31.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash31.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash31Expression =
    copy(child = newChild)
}
