package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}

/** CRC32 with the CRC32-Q polynomial (0xD5828281), reflected, init/xorout
  * 0xFFFFFFFF — the exact checksum the reference uses for change detection
  * (reference `internal/recon/recon.go:32`, `recon.go:155`; Go
  * `hash/crc32.MakeTable(Koopman)` semantics, which build the reflected
  * table from the LSB-first polynomial).
  *
  * Spark's built-in `crc32` uses the IEEE polynomial, so byte-identical
  * parity with the reference's stored hashes needs this ~30-line table-driven
  * implementation (standard public CRC construction). Exposed as a native
  * Catalyst [[UnaryExpression]] with codegen (a static-method call, so it
  * stays inside whole-stage codegen — no UDF serialization, no codegen
  * fallback in the hot path).
  */
object Crc32Q {
  final val Poly: Int = 0xD5828281

  private val table: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var crc = i
      var j = 0
      while (j < 8) {
        crc = if ((crc & 1) != 0) (crc >>> 1) ^ Poly else crc >>> 1
        j += 1
      }
      t(i) = crc
      i += 1
    }
    t
  }

  /** Checksum of `bytes` as an unsigned 32-bit value in a Long. */
  def compute(bytes: Array[Byte]): Long = {
    var crc = 0xFFFFFFFF
    var i = 0
    while (i < bytes.length) {
      crc = table((crc ^ bytes(i)) & 0xFF) ^ (crc >>> 8)
      i += 1
    }
    (crc ^ 0xFFFFFFFF).toLong & 0xFFFFFFFFL
  }

  def computeUtf8(s: String): Long =
    compute(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Column API: `crc32q(col)` over binary (strings cast to UTF-8 bytes,
    * matching the reference hashing `[]byte(value)` — `recon.go:137`). */
  def apply(c: Column): Column =
    GraftSqlBridge.column(Crc32QExpression(
      GraftSqlBridge.expression(c.cast(BinaryType))))
}

case class Crc32QExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"crc32q requires BINARY or STRING input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "crc32q"

  override def nullSafeEval(input: Any): Any = input match {
    case b: Array[Byte] => Crc32Q.compute(b)
    case s: org.apache.spark.unsafe.types.UTF8String => Crc32Q.compute(s.getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Crc32Q.compute($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Crc32Q.compute(($c).getBytes())")
    }

  override protected def withNewChildInternal(newChild: Expression): Crc32QExpression =
    copy(child = newChild)
}
