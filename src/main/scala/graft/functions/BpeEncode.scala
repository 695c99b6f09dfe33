package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count of a text under a TRAINED byte-pair-encoding merge list —
  * the "how many tokens will this doc cost" half of the BPE story whose
  * training half is `TextAnalysis.bpeMerges` (Sennrich et al. 2016,
  * public literature). The merge list (rank-ordered pairs from training)
  * rides inside the expression; encoding replays the merges in rank
  * order over each whitespace word's character sequence with EXACTLY the
  * trainer's left-fold semantics (`acc.last == x && s == y → fuse`), so
  * a word the trainer saw collapses to the same symbols here.
  *
  * A native codegen'd expression (same shape as [[TokenSetCountExpression]]):
  * the merge table is a constructor-bound reference object, the hot path
  * is one static call inside whole-stage codegen — a projection, no
  * shuffle, linear in bytes × |merges|. This is the per-document cost
  * model a packing/budgeting stage (`pack_sequences`) runs at corpus
  * scale once a tokenizer is trained. */
object BpeEncode {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeEncodeExpression(
      GraftSqlBridge.expression(text), merges))

  /** Total symbol count of `s` after replaying `merges` (rank order) on
    * each whitespace-delimited word of `lower(trim(s))`. */
  def count(s: UTF8String, merges: Array[Array[String]]): Long = {
    val str = s.toString.toLowerCase.trim
    if (str.isEmpty) return 0L
    var total = 0L
    val words = str.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      val word = words(wi)
      if (word.nonEmpty) {
        var syms: Array[String] = word.toCharArray.map(String.valueOf)
        var mi = 0
        while (mi < merges.length) {
          val x = merges(mi)(0)
          val y = merges(mi)(1)
          val out = new java.util.ArrayList[String](syms.length)
          var i = 0
          while (i < syms.length) {
            val n = out.size()
            if (n > 0 && out.get(n - 1) == x && syms(i) == y)
              out.set(n - 1, x + y)
            else out.add(syms(i))
            i += 1
          }
          syms = out.toArray(new Array[String](out.size()))
          mi += 1
        }
        total += syms.length
      }
      wi += 1
    }
    total
  }
}

case class BpeEncodeExpression(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncode.count(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncode.count($c, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
