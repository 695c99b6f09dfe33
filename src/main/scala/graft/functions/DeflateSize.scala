package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}

/** Compressed size of a value under raw DEFLATE (RFC 1951, level 6, no
  * zlib/gzip wrapper) — the classic compression-ratio quality signal for
  * training-data curation: natural prose compresses to ~35-60% of its
  * size, boilerplate/template spam compresses far below that, and
  * random/base64 junk barely compresses at all (Gopher/CCNet-style
  * corpus filtering uses exactly this discriminator, from the public
  * literature).
  *
  * A native codegen'd [[UnaryExpression]] (same shape as
  * [[Crc32QExpression]]): one static-method call inside whole-stage
  * codegen, a thread-confined `Deflater` allocated per call (Deflater is
  * not thread-safe; per-call allocation is the safe form and the ~µs
  * setup is noise next to the compression itself). The 100 TB shape is a
  * pure projection — no state, no shuffle, cost linear in bytes scanned.
  *
  * Oracle note: the byte count depends on the JVM's zlib build, so
  * queries over it are registered rows-only; `DeflateSizeSpec` pins the
  * signal's semantics (ordering between repetitive / prose / random
  * inputs, exact empty-input size, monotonicity under concatenation)
  * rather than a zlib-version-fragile byte constant.
  */
object DeflateSize {

  /** Deflated byte count of `bytes` at level 6, raw deflate (nowrap). */
  def compute(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def computeUtf8(s: String): Long =
    compute(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column API: `deflate_size(col)` over binary (strings as UTF-8). */
  def apply(c: Column): Column =
    GraftSqlBridge.column(DeflateSizeExpression(
      GraftSqlBridge.expression(c.cast(BinaryType))))
}

case class DeflateSizeExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires BINARY or STRING input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(input: Any): Any = input match {
    case b: Array[Byte] => DeflateSize.compute(b)
    case s: org.apache.spark.unsafe.types.UTF8String =>
      DeflateSize.compute(s.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.compute($c)")
      case _ =>
        defineCodeGen(ctx, ev,
          c => s"graft.functions.DeflateSize.compute(($c).getBytes())")
    }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateSizeExpression = copy(child = newChild)
}
