package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k as a native aggregate — the scale-side
  * alternative to the window-rank form (`topKPerGroup` /
  * `WindowGroupLimit`): the aggregate's state is EXACTLY k (value, id)
  * pairs per group, maintained map-side and merged pairwise, so the
  * shuffle moves one k-pair buffer per group instead of every row of
  * every group. For k ≪ group size (the "top 3 orders per segment over a
  * billion orders" shape) that is the difference between a buffer
  * exchange and a data exchange; the window form stays preferable when
  * groups are small or k is large.
  *
  * Ordering is (value DESC, id ASC) — id breaks ties so results are
  * rerun- and merge-order-stable, the same determinism discipline as
  * every ranked operator here. */
object TopKAgg {

  /** Column API: top-k (v, id) pairs per group as
    * `array<struct<v: long, id: long>>`, largest v first. */
  def topK(v: Column, id: Column, k: Int): Column = {
    val child = CreateNamedStruct(Seq(
      Literal("v"), GraftSqlBridge.expression(v.cast("long")),
      Literal("id"), GraftSqlBridge.expression(id.cast("long"))))
    GraftSqlBridge.column(
      TopKAggExpression(child, k).toAggregateExpression())
  }
}

case class TopKAggExpression(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0 || k > 1024) TypeCheckResult.TypeCheckFailure(
      s"topk_agg k must be in [1, 1024], got $k")
    else child.dataType match {
      case StructType(Array(a, b))
        if a.dataType == LongType && b.dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires STRUCT<BIGINT, BIGINT> input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  // buffer: [n, v0, id0, v1, id1, ...] kept sorted by (v desc, id asc);
  // n ≤ k actual entries
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + 2 * k)

  private def beats(v1: Long, id1: Long, v2: Long, id2: Long): Boolean =
    v1 > v2 || (v1 == v2 && id1 < id2)

  private def insert(buf: Array[Long], v: Long, id: Long): Unit = {
    val n = buf(0).toInt
    if (n == k && !beats(v, id, buf(1 + 2 * (n - 1)), buf(2 + 2 * (n - 1))))
      return
    // find insertion slot among the n sorted entries
    var i = 0
    while (i < n && beats(buf(1 + 2 * i), buf(2 + 2 * i), v, id)) i += 1
    val last = if (n == k) k - 1 else n
    var j = last
    while (j > i) {
      buf(1 + 2 * j) = buf(1 + 2 * (j - 1))
      buf(2 + 2 * j) = buf(2 + 2 * (j - 1))
      j -= 1
    }
    buf(1 + 2 * i) = v
    buf(2 + 2 * i) = id
    if (n < k) buf(0) = n + 1
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val s = child.eval(input)
    if (s != null) {
      val row = s.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        insert(buf, row.getLong(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val nb = b(0).toInt
    var i = 0
    while (i < nb) {
      insert(a, b(1 + 2 * i), b(2 + 2 * i))
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0).toInt
    new GenericArrayData((0 until n).map(i =>
      InternalRow(buf(1 + 2 * i), buf(2 + 2 * i))).toArray[Any])
  }

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAggExpression =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAggExpression =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKAggExpression =
    copy(child = c)
}
