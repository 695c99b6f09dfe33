package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch aggregates (MinHash signature, SimHash) as native
  * [[TypedImperativeAggregate]]s with a primitive-array buffer.
  *
  * The column-expression formulation (64 independent `min(xxhash64(i, s))` /
  * `sum(when(bit))` aggregate columns) is semantically identical but
  * generates enormous whole-stage-codegen classes — the JIT cost of
  * compiling them once per query dwarfed the actual row work and showed up
  * as multi-second, high-variance per-query overhead. One imperative
  * aggregate with an `Array[Long]` buffer keeps the generated code tiny and
  * does the per-row work in a tight JVM loop; the planner runs it as an
  * ObjectHashAggregate with map-side partial merge, so only k-long buffers
  * shuffle per key — the scale shape is unchanged (one hash shuffle on the
  * doc id, fixed-size state per doc).
  */
object SketchAggs {

  /** k min-hashes over the values of `shingle` per group, as `array<long>`.
    *
    * Hash family: double hashing `h_i = h1 + i·h2` over two independent
    * xxhash64 passes of the shingle bytes (seeds 42 / 0x9747b28c) — the
    * standard O(1)-per-function construction (one string scan per seed
    * instead of k), with the same pairwise-collision behavior LSH banding
    * needs. */
  def minhash(shingle: Column, k: Int = 64): Column =
    GraftSqlBridge.column(
      MinhashAggExpression(GraftSqlBridge.expression(shingle), k)
        .toAggregateExpression())

  /** 64-bit SimHash of the given per-row 64-bit token hashes: per-bit ±1
    * votes summed per group, sign → bit. Identical output to the 64-column
    * sum/when formulation. */
  def simhash(tokenHash: Column): Column =
    GraftSqlBridge.column(
      SimhashAggExpression(GraftSqlBridge.expression(tokenHash))
        .toAggregateExpression())

  /** Element-wise MAX of fixed-width `array<long>` register vectors — the
    * HyperLogLog-register union that HyperBall-style iterated sketch
    * propagation needs per round (max of rho values is exactly HLL union).
    * Same engineering rationale as the sketches above: one imperative
    * aggregate with a primitive buffer instead of m parallel `max(regs[i])`
    * aggregate columns, so the codegen class stays tiny and only m-long
    * buffers shuffle per key. */
  def regMax(regs: Column, m: Int): Column =
    GraftSqlBridge.column(
      RegMaxAggExpression(GraftSqlBridge.expression(regs), m)
        .toAggregateExpression())

  /** Second-moment sufficient statistics of a quantized vector corpus in
    * ONE aggregate: given per-row `array<long>` coordinates (length d,
    * constant across rows), accumulates n, the d coordinate sums Σxᵢ and
    * the d² outer-product sums Σxᵢxⱼ into a single primitive buffer —
    * the covariance front end of [[graft.operators.Similarity.pcaPower]].
    *
    * This replaces a double-posexplode moment pass (N·d² generated rows,
    * each re-rounding a coordinate and ferrying the whole vector): the
    * generate/re-round work collapses into a tight d² JVM loop per row,
    * and only ONE (1+d+d²)-long buffer per partial shuffles — for d=64
    * that is ~33 KB per task instead of 8M+ exchanged rows. d is
    * discovered from the first non-null row (buffer sized lazily), so
    * callers need no schema pre-pass.
    *
    * Output layout (array<long>): [d, n, sx(0..d-1), sxx row-major]. */
  def moments(quantized: Column): Column =
    GraftSqlBridge.column(
      MomentAggExpression(GraftSqlBridge.expression(quantized))
        .toAggregateExpression())

  private[functions] def serializeLongs(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  private[functions] def deserializeLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}

case class MinhashAggExpression(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"minhash_agg k must be positive, got $k")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_agg requires STRING input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h1 = XXH64.hashUTF8String(s, 42L)
      val h2 = XXH64.hashUTF8String(s, 0x9747b28cL)
      var i = 0
      var h = h1
      while (i < k) {
        if (h < buf(i)) buf(i) = h
        h += h2
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MinhashAggExpression =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinhashAggExpression =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MinhashAggExpression =
    copy(child = c)
}

case class RegMaxAggExpression(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (m <= 0) TypeCheckResult.TypeCheckFailure(
      s"regmax_agg m must be positive, got $m")
    else child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"regmax_agg requires ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "regmax_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements == m,
        s"regmax_agg: expected $m registers, got ${arr.numElements}")
      var i = 0
      while (i < m) {
        val r = arr.getLong(i)
        if (r > buf(i)) buf(i) = r
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): RegMaxAggExpression =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RegMaxAggExpression =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): RegMaxAggExpression =
    copy(child = c)
}

case class MomentAggExpression(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"moment_agg requires ARRAY<BIGINT> input (quantized coordinates), " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "moment_agg"

  // Buffer layout [d, n, sx(d), sxx(d·d)]; sized lazily on the first
  // non-null input so d needs no pre-pass. Empty array = "no input yet".
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def alloc(d: Int): Array[Long] = {
    val b = new Array[Long](2 + d + d * d)
    b(0) = d.toLong
    b
  }

  override def update(buf0: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf0
    else {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val d = arr.numElements
      val buf = if (buf0.length == 0) alloc(d) else buf0
      require(buf(0) == d.toLong,
        s"moment_agg: inconsistent vector length ${d}, expected ${buf(0)}")
      val x = new Array[Long](d)
      var i = 0
      while (i < d) { x(i) = arr.getLong(i); i += 1 }
      buf(1) += 1L
      i = 0
      while (i < d) {
        buf(2 + i) += x(i)
        val row = 2 + d + i * d
        val xi = x(i)
        var j = 0
        while (j < d) { buf(row + j) += xi * x(j); j += 1 }
        i += 1
      }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (b.length == 0) a
    else if (a.length == 0) b
    else {
      require(a(0) == b(0),
        s"moment_agg: merging buffers of different dimension ${a(0)} / ${b(0)}")
      var i = 1
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MomentAggExpression =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MomentAggExpression =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MomentAggExpression =
    copy(child = c)
}

case class SimhashAggExpression(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires BIGINT input (a 64-bit token hash), got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] =
    SketchAggs.serializeLongs(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    SketchAggs.deserializeLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SimhashAggExpression =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimhashAggExpression =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimhashAggExpression =
    copy(child = c)
}
