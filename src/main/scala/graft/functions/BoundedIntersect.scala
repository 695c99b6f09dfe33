package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Threshold-bounded intersection count of two SORTED `array<long>`
  * columns: the exact |a ∩ b| when it can still reach `minCommon`, or
  * −1 the moment it provably cannot — the similarity-join verification
  * primitive (the verify-side pruning of the PPJoin family, Xiao et al.
  * WWW'08 §3.3, taken to its limit: the suffix filter probes one median
  * token to bound the overlap, while a bounded merge walk accumulates
  * the SAME bound `count + min(remaining_a, remaining_b)` continuously
  * and aborts at the first position the threshold is unreachable —
  * one pass, exact count for survivors, no second probe).
  *
  * Why not `array_intersect`: Spark's builtin builds a per-ROW hash set
  * of one side — allocation plus hashing per candidate pair, with no
  * early exit. At a 95% Jaccard threshold a false candidate's walk
  * aborts after ~2·(1−t)·n mismatches (~6% of the union), so the
  * dominant false-candidate population costs ~16× less than a full
  * intersect. The walk requires both arrays sorted ascending and
  * duplicate-free — the `sort_array(collect_list(...))` over
  * DISTINCT (id, token) rows the join already builds.
  *
  * Null contract: null array or null threshold → null (candidate rows
  * never have them; loud absence beats a fabricated count). Null
  * ELEMENTS are rejected at analysis time (containsNull=false
  * required): getLong on a null slot would silently read 0. */
object BoundedIntersect {
  def apply(a: Column, b: Column, minCommon: Column): Column =
    GraftSqlBridge.column(BoundedIntersectExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b),
      GraftSqlBridge.expression(minCommon)))

  /** Merge walk with continuous reachability bound; interpreted-mode
    * twin of the generated call. Returns |x ∩ y| if ≥ minCommon is
    * still reachable at every step, else −1. */
  def compute(x: ArrayData, y: ArrayData, minCommon: Long): Long = {
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val rem = math.min(nx - i, ny - j)
      if (c + rem < minCommon) return -1L
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    if (c < minCommon) -1L else c
  }
}

case class BoundedIntersectExpression(first: Expression,
    second: Expression, third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      // containsNull arrays are REJECTED, not tolerated: the merge walk
      // reads elements via ArrayData.getLong, where a null element would
      // silently decay to 0 and corrupt the count. Call sites build
      // arrays as sort_array(collect_list(...)) over non-null hashes,
      // whose type is containsNull=false by construction — so a
      // containsNull=true input here is always a caller bug, and analysis
      // time is the right moment to say so.
      case (ArrayType(LongType, false), ArrayType(LongType, false),
          LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "bounded_intersect requires (ARRAY<BIGINT> containsNull=false, " +
          "ARRAY<BIGINT> containsNull=false, BIGINT), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "bounded_intersect"

  override def nullSafeEval(a: Any, b: Any, m: Any): Any =
    BoundedIntersect.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m) =>
      s"${ev.value} = graft.functions.BoundedIntersect.compute($a, $b, $m);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
