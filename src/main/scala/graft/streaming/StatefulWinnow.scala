package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.unsafe.types.UTF8String

/** A streaming document: `doc_id` plus its full text (documents arrive
  * whole — winnowing is defined per document, so the per-doc fingerprint
  * step is stateless and only the cross-document store carries state). */
case class DocRow(doc_id: Long, text: String)

/** One winnow fingerprint of a streaming document: `pos` the 1-based
  * k-gram start, `fp` the selected window-minimum hash — the same
  * (id, pos, fp) rows [[graft.operators.TextAnalysis.winnowFingerprints]]
  * emits in batch. */
case class FpRow(doc_id: Long, pos: Long, fp: Long)

/** A streaming winnow collision: `b` shares fingerprint `fp` with the
  * earlier-seen `a` (ids canonicalized `a < b`). A row with `a = b = -1`
  * is a DF-BREACH TOMBSTONE: fingerprint `fp`'s document frequency
  * exceeded the cap, so every hit previously emitted for that fp is
  * void — the append-only form of the batch tier's retrospective
  * "drop fingerprints seen in > maxDf documents" rule
  * ([[StatefulWinnow.scoreHits]] applies the invalidation). */
case class WinnowHit(a: Long, b: Long, fp: Long)

/** Streaming winnowing (MOSS; Schleimer et al. 2003): the stateful twin
  * of the batch `winnow_fingerprints`/`winnow_pairs` family for an
  * unbounded document stream — per-document fingerprint emission plus a
  * df-capped fingerprint-store state, the [[StatefulCdcChunker]]
  * discipline applied to the last batch dedup family without a twin.
  *
  * Two composable stages:
  *  1. [[fingerprintStream]] — stateless per-doc winnowing, bit-identical
  *     to the batch operator (same `substring` character semantics via
  *     `UTF8String.substringSQL`, same seed-42 xxhash64, same
  *     rightmost-minimum selection algebra with the `min(w, m) − 1`
  *     short-document threshold).
  *  2. [[hits]] — a `transformWithState` store keyed by FINGERPRINT: a
  *     `ListState[Long]` of resident doc ids per fp. A new document
  *     pairs against every resident and joins the bucket; the arrival
  *     that pushes a bucket PAST `maxDf` emits a tombstone, clears the
  *     list, and marks the fp dead — later arrivals are dropped in O(1).
  *     Batch parity is exact BECAUSE the breach is order-invariant:
  *     a fp breaches iff its total distinct df exceeds the cap, whatever
  *     the slicing, and [[scoreHits]] voids all of a breached fp's hits,
  *     exactly the batch rule's retrospective drop.
  *
  * Scale posture: store state is ≤ maxDf ids per LIVE fingerprint and
  * one boolean per dead one (boilerplate fps cost one flag, not an
  * unbounded bucket — the inverse of the batch tier, which must carry
  * the full inverted index to find the cap breaches); `ttl` evicts
  * fingerprints untouched for the duration, bounding state to the
  * working set. Within a micro-batch arrivals fold in ascending doc-id
  * order, so replays are deterministic. Requires the RocksDB state
  * store provider (Spark's `transformWithState` contract). */
object StatefulWinnow {

  /** Winnow fingerprints of ONE document — the batch operator's
    * lag/lead-run selection rule, evaluated directly: position p is
    * selected iff some w-window containing p has p as its RIGHTMOST
    * minimum, i.e. `a` consecutive left neighbors with h ≥ h_p and `b`
    * consecutive right neighbors with h > h_p reach a + b ≥ min(w,m)−1
    * (runs capped at w−1; document edges stop runs, which caps the
    * threshold for short documents exactly as the batch form's
    * null-stopped windows do). */
  def fingerprintsOf(docId: Long, text: String, k: Int, w: Int)
      : Iterator[FpRow] = {
    // null text: the batch operator's substring(null, …) hashes to the
    // raw xxhash64 seed (42) at position 1 — mirror it exactly rather
    // than coercing null to "" (which hashes differently)
    if (text == null) return Iterator.single(FpRow(docId, 1L, 42L))
    val u = UTF8String.fromString(text)
    val m = math.max(u.numChars - (k - 1), 1)
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = XxHash64Function.hash(u.substringSQL(i + 1, k),
        StringType, 42L)
      i += 1
    }
    val thr = math.min(w, m) - 1
    val out = Iterator.range(0, m).filter { p =>
      var a = 0
      while (a < w - 1 && p - a - 1 >= 0 && hs(p - a - 1) >= hs(p)) a += 1
      var b = 0
      while (b < w - 1 && p + b + 1 < m && hs(p + b + 1) > hs(p)) b += 1
      a + b >= thr
    }
    out.map(p => FpRow(docId, p + 1L, hs(p)))
  }

  /** Document stream → fingerprint stream (stateless flatMap — exact
    * batch parity is pinned in StreamingWinnowSpec). */
  def fingerprintStream(ds: Dataset[DocRow], k: Int = 8, w: Int = 4)
      : Dataset[FpRow] = {
    require(k >= 2 && k <= 64, s"k=$k out of range")
    require(w >= 2 && w <= 64, s"w=$w out of range")
    implicit val enc = Encoders.product[FpRow]
    ds.flatMap(d => fingerprintsOf(d.doc_id, d.text, k, w))
  }

  private class FpProcessor(ttl: TTLConfig, maxDf: Int)
      extends StatefulProcessor[Long, FpRow, WinnowHit] {
    @transient private var members: ListState[Long] = _
    @transient private var dead: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, ttl)
      dead = getHandle.getValueState[Boolean]("dead",
        Encoders.scalaBoolean, ttl)
    }

    override def handleInputRows(key: Long, rows: Iterator[FpRow],
        timerValues: TimerValues): Iterator[WinnowHit] = {
      if (dead.exists() && dead.get()) return Iterator.empty
      val resident = scala.collection.mutable.LinkedHashSet.empty[Long]
      members.get().foreach(resident += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[WinnowHit]
      var appended = List.empty[Long]
      var breached = false
      val arrivals = rows.toArray.map(_.doc_id).distinct.sorted.iterator
      while (!breached && arrivals.hasNext) {
        val id = arrivals.next()
        if (!resident.contains(id)) {
          if (maxDf > 0 && resident.size >= maxDf) {
            // this arrival pushes the fp past the cap: void the fp
            out += WinnowHit(-1L, -1L, key)
            members.clear()
            dead.update(true)
            breached = true
            appended = Nil
          } else {
            resident.foreach { e =>
              out += WinnowHit(math.min(e, id), math.max(e, id), key)
            }
            resident += id
            appended ::= id
          }
        }
      }
      if (appended.nonEmpty) members.appendList(appended.reverse.toArray)
      out.iterator
    }
  }

  /** Fingerprint stream → collision stream. `maxDf = 0` disables the
    * cap; `ttl = None` keeps fingerprints forever (exact parity with the
    * batch pair tier over the full history). Input rows should be
    * distinct per (doc, fp) — [[fingerprintStream]] output may repeat a
    * fingerprint at several positions; the store ignores repeats. */
  def hits(ds: Dataset[FpRow], maxDf: Int = 0,
      ttl: Option[java.time.Duration] = None): Dataset[WinnowHit] = {
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val outEnc = Encoders.product[WinnowHit]
    ds.groupByKey(_.fp)(Encoders.scalaLong)
      .transformWithState(new FpProcessor(cfg, maxDf), mode,
        OutputMode.Append())
  }

  /** Batch-side read-out of a collected hit stream: void every breached
    * fingerprint's hits, then count shared fps per pair — the streaming
    * equivalent of the batch `winnow_pairs` aggregate. Expects columns
    * (a, b, fp). */
  def scoreHits(hitRows: DataFrame, minShared: Int): DataFrame = {
    val breached = hitRows.filter(col("a") < 0L).select(col("fp")).distinct()
    hitRows.filter(col("a") >= 0L)
      .join(breached, Seq("fp"), "left_anti")
      .groupBy(col("a").as("id_a"), col("b").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
