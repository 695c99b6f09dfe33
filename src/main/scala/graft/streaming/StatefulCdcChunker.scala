package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One byte of a streaming binary asset: `id` the asset, `k` its 0-based
  * offset, `b` the byte value 0..255 — the pre-exploded row form
  * [[graft.operators.Multimodal.cdcChunkRows]] consumes in batch. A row
  * with `b = -1` is the END-OF-ASSET marker: it closes and emits the
  * open trailing chunk (a real pipeline would use a timer/TTL instead;
  * the marker keeps the twin deterministic). A marker's `k` IS its
  * position: set it to the end offset (one past the last byte sent).
  * Within a micro-batch, rows are processed in `k` order with a marker
  * ahead of a data row at the same `k` — so a marker followed by
  * post-marker resume bytes in the SAME batch segments identically to
  * the resume arriving in a later batch (StreamingCdcSpec pins this). */
case class ByteRow(id: Long, k: Long, b: Long)

/** A closed chunk: identical columns to the batch operator's output,
  * minus chunk_idx (an order-dependent rank the consumer can reassign —
  * the verdict stream is append-only). */
case class ChunkOut(id: Long, off: Long, len: Long, chunkSig: Long)

/** Streaming content-defined chunking: the stateful twin of
  * [[graft.operators.Multimodal.cdcChunkRows]] for unbounded binary
  * streams — chunk boundaries depend only on the last `window` bytes,
  * so the carry is O(window) per asset: the last window−1 gear values,
  * the open chunk's offset and running signature, and the next expected
  * offset. A chunk is emitted the moment its boundary byte arrives;
  * the trailing chunk stays open in state until the end-marker row.
  *
  * Parity contract (pinned in StreamingCdcSpec): feed an asset's bytes
  * in order across any micro-batch slicing and the emitted chunks equal
  * the batch operator's (off, len, sig) rows exactly — the boundary
  * rule, gear, and chunk-relative positional signature are the same
  * fixed-point algebra, accumulated incrementally (the signature's
  * commutative mod-P sum makes per-byte accumulation trivially equal to
  * the batch aggregate). Bytes arriving out of order violate the
  * contract and are DROPPED (a production source would carry a
  * per-asset sequence guarantee, e.g. a Kafka partition per asset).
  *
  * Scale posture: state is a handful of longs per OPEN asset — not per
  * chunk, not per byte; `ttl` evicts assets whose stream went quiet. */
object StatefulCdcChunker {

  /** The O(window) carry: `gs` = gear values of the last window−1 bytes,
    * most recent FIRST; `nextK` enforces in-order arrival. */
  case class CdcCarry(nextK: Long, off: Long, sig: Long, gs: Array[Long])

  private val P = 1000000007L

  private class ChunkProcessor(window: Int, maskBits: Int, ttl: TTLConfig)
      extends StatefulProcessor[Long, ByteRow, ChunkOut] {
    @transient private var carry: ValueState[CdcCarry] = _
    private val mask = (1L << maskBits) - 1L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      carry = getHandle.getValueState[CdcCarry]("carry",
        Encoders.product[CdcCarry], ttl)

    override def handleInputRows(key: Long, rows: Iterator[ByteRow],
        timerValues: TimerValues): Iterator[ChunkOut] = {
      var st = if (carry.exists()) carry.get()
        else CdcCarry(0L, 0L, 0L, Array.empty[Long])
      val out = scala.collection.mutable.ListBuffer.empty[ChunkOut]
      // Rows process in k order, a marker BEFORE a data row at the same
      // k: after a flush nextK is unchanged, so resume bytes share the
      // marker's k and must see the post-flush state. Positional markers
      // make in-batch order fully determined by k — a marker followed by
      // post-marker bytes in the same micro-batch flushes at its k
      // instead of silently folding the new bytes into the old chunk.
      rows.toArray.sortBy(r => (r.k, r.b >= 0L)).foreach { r =>
        if (r.b < 0L) {
          // end marker: close the trailing chunk (if any bytes arrived).
          // The gear carry SURVIVES the marker — it is byte history, not
          // chunk state — so an asset resumed after a forced cut keeps
          // hash windows faithful to its actual bytes.
          if (st.nextK > st.off)
            out += ChunkOut(key, st.off, st.nextK - st.off,
              Math.floorMod(st.sig, P))
          st = CdcCarry(st.nextK, st.nextK, 0L, st.gs)
        } else if (r.k == st.nextK) {
          val g = ((r.b + 1L) * 2654435761L) % 4294967296L
          val rel = r.k - st.off
          // TRUE modular cube, reduced per multiply exactly like the
          // batch operator (Multimodal.cdcChunks): fold rel+13 below P
          // first, square mod P, one more multiply mod P — every
          // intermediate < P² ≈ 1e18 < 2⁶³, so the value is the exact
          // (rel+13)³ mod P at ANY offset. The previous form floorMod'd
          // a silently WRAPPED product past rel ≈ 2.1e6 — matching a
          // batch plan that, under ANSI mode, actually throws there.
          val r0 = Math.floorMod(rel + 13L, P)
          val cube = Math.floorMod(Math.floorMod(r0 * r0, P) * r0, P)
          val sig = Math.floorMod(st.sig + (r.b + 7L) * cube, P)
          // h over the last `window` bytes: current gear + carried gears
          // shifted by recency; incomplete leading windows never cut
          val full = st.gs.length == window - 1
          val h = g + st.gs.zipWithIndex.map { case (gp, j) =>
            gp * (1L << (j + 1)) }.sum
          if (full && (h & mask) == 0L) {
            out += ChunkOut(key, st.off, r.k - st.off + 1L, sig)
            st = CdcCarry(r.k + 1L, r.k + 1L, 0L,
              (g +: st.gs).take(window - 1))
          } else {
            st = CdcCarry(r.k + 1L, st.off, sig,
              (g +: st.gs).take(window - 1))
          }
        } // else: out-of-order — contract violation, dropped
      }
      carry.update(st)
      out.iterator
    }
  }

  /** Byte stream → closed-chunk stream. Defaults mirror the batch
    * operator (window 8, 8-bit mask ⇒ 256-byte expected chunks). */
  def chunks(ds: Dataset[ByteRow], window: Int = 8, maskBits: Int = 8,
      ttl: Option[java.time.Duration] = None): Dataset[ChunkOut] = {
    require(window >= 2 && window <= 32, s"window=$window out of range")
    require(maskBits >= 4 && maskBits <= 20, s"maskBits=$maskBits")
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val outEnc = Encoders.product[ChunkOut]
    ds.groupByKey(_.id)(Encoders.scalaLong)
      .transformWithState(new ChunkProcessor(window, maskBits, cfg), mode,
        OutputMode.Append())
  }
}
