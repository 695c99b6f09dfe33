package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One cell-assigned embedding: `cid` is the vector's IVF cell (the
  * [[graft.operators.Similarity.semDedup]] argmax assignment — broadcast
  * centroids, stateless, so it composes onto a stream as a projection),
  * `id` the vector's id, `vec` the embedding cast to doubles. */
case class CellVector(cid: Long, id: Long, vec: Array[Double])

/** A streaming SemDeDup verdict: `pruned` = 1 iff some EARLIER-SEEN
  * member of the same cell sits at/above the cosine threshold — the
  * arrival-order form of the batch tier's lower-id rule. */
case class SemVerdict(id: Long, cid: Long, pruned: Long)

/** Streaming SemDeDup: the stateful twin of
  * [[graft.operators.Similarity.semDedup]] for an unbounded embedding
  * stream. State lives per CELL: a `ListState` of the (id, vec) members
  * seen so far. A new vector scores one dot product against each
  * resident member — O(|cell|) per arrival, the same in-cell-only bound
  * as the batch self-join, never corpus-wide — and its verdict streams
  * out with one micro-batch latency.
  *
  * Parity contract: the batch rule prunes on ANY lower-id in-cell member
  * (pruned members still dominate later arrivals). The processor keeps
  * ALL seen members in state — not just survivors — and folds each
  * micro-batch's arrivals in ascending id order, so feeding a corpus in
  * id order reproduces the batch verdicts exactly (pinned in
  * StreamingSemDedupSpec). Cosines quantize to rounded permille with the
  * identical left-to-right double summation as the batch expression.
  *
  * Scale posture:
  *  - `maxCell` caps resident members per cell (first-come membership;
  *    arrivals beyond the cap still receive verdicts against the
  *    residents but are not added) — a degenerate hot cell costs
  *    O(maxCell) per arrival, the [[StatefulLshDedup]] cap discipline.
  *  - `ttl` evicts cells untouched for the duration — dedup against a
  *    sliding working set, bounded state.
  * Requires the RocksDB state store provider (`transformWithState`). */
object StatefulSemDedup {

  private[streaming] def cosPermille(a: Array[Double],
      b: Array[Double]): Long = {
    var (dab, daa, dbb) = (0.0, 0.0, 0.0)
    var i = 0
    while (i < a.length) {
      dab += a(i) * b(i); daa += a(i) * a(i); dbb += b(i) * b(i); i += 1
    }
    // Spark's round() is HALF_UP — away from zero, so round(-0.5) = -1 —
    // while Scala's math.round is floor(x+0.5), which sends -0.5 to 0.
    // The batch twin quantizes with Spark's round; a negative cosine
    // landing exactly on a .5 permille boundary would otherwise break
    // the exact stream/batch parity StreamingSemDedupSpec pins.
    // A zero-norm vector makes the cosine NaN; the batch twin's
    // NaN-cosine comparison is never >= threshold (not dominated), so
    // quantize NaN/Inf to 0 instead of letting BigDecimal throw and
    // permanently fail the streaming query.
    val c = dab / (math.sqrt(daa) * math.sqrt(dbb)) * 1000.0
    if (c.isNaN || c.isInfinite) 0L
    else BigDecimal(c).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  /** A resident cell member held in state. */
  case class CellMember(id: Long, vec: Array[Double])

  private class CellProcessor(ttl: TTLConfig, thresholdPermille: Int,
      maxCell: Int)
      extends StatefulProcessor[Long, CellVector, SemVerdict] {
    @transient private var members: ListState[CellMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[CellMember]("members",
        Encoders.product[CellMember], ttl)

    override def handleInputRows(key: Long, rows: Iterator[CellVector],
        timerValues: TimerValues): Iterator[SemVerdict] = {
      val resident = scala.collection.mutable.ArrayBuffer.empty[CellMember]
      members.get().foreach(resident += _)
      val seen = scala.collection.mutable.Set.empty[Long]
      resident.foreach(seen += _.id)
      val out = scala.collection.mutable.ArrayBuffer.empty[SemVerdict]
      var appended = List.empty[CellMember]
      rows.toArray.sortBy(_.id).foreach { v =>
        if (!seen.contains(v.id)) {
          seen += v.id
          val dominated = resident.exists(m =>
            cosPermille(m.vec, v.vec) >= thresholdPermille)
          out += SemVerdict(v.id, key, if (dominated) 1L else 0L)
          if (maxCell <= 0 || resident.size < maxCell) {
            resident += CellMember(v.id, v.vec)
            appended ::= CellMember(v.id, v.vec)
          }
        }
      }
      if (appended.nonEmpty) members.appendList(appended.reverse.toArray)
      out.iterator
    }
  }

  /** Cell-assigned vector stream → verdict stream. `ttl = None` keeps
    * cells forever (exact parity with the batch verdicts over the full
    * history); a TTL bounds state to the working set and forces
    * processing-time mode. */
  def verdicts(ds: Dataset[CellVector], thresholdPermille: Int,
      maxCell: Int = 0,
      ttl: Option[java.time.Duration] = None): Dataset[SemVerdict] = {
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val outEnc = Encoders.product[SemVerdict]
    ds.groupByKey(_.cid)(Encoders.scalaLong)
      .transformWithState(
        new CellProcessor(cfg, thresholdPermille, maxCell), mode,
        OutputMode.Append())
  }
}
