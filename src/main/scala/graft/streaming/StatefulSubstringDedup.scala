package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One `k`-token sliding-window occurrence of a streaming document — the
  * [[graft.operators.TextAnalysis.windowGrams]] projection (stateless,
  * so it composes onto a doc stream unchanged): `gram` the window
  * string, `id` the document, `p` its 1-based start position. */
case class GramOcc(gram: String, id: Long, p: Long)

/** A streaming exact-substring verdict: `dup` = 1 iff the window
  * string's TOTAL occurrence count through the end of the arrival's
  * micro-batch is at least 2 (within-document repeats count, as in the
  * suffix-array formulation of the batch operator). */
case class GramVerdict(id: Long, p: Long, gram: String, dup: Long)

/** Streaming exact-substring dedup: the stateful twin of
  * [[graft.operators.TextAnalysis.dupSpans]] (Lee et al. 2022's
  * suffix-array substring dedup, fixed-`k` window relaxation) for an
  * unbounded document stream — the last batch-only dedup family to gain
  * a streaming twin (LSH, SemDeDup and CCNet line dedup already have
  * theirs). State lives per GRAM: one `ValueState` occurrence counter,
  * saturating at 2 — beyond "duplicated" the verdict can never change
  * back, so the stored counter needs no further growth (the
  * [[StatefulLineDedup]] saturation discipline).
  *
  * Parity contract (pinned in StreamingSubstringSpec): the batch rule
  * is GLOBAL — a window string's count spans the whole corpus — so a
  * one-pass processor twins the batch operator run over everything seen
  * THROUGH THE END of the arrival's micro-batch: every occurrence in a
  * batch gets the post-batch count (batch `count >= 2` counts the
  * arriving occurrences too). Feed the corpus one slice per micro-batch
  * and each slice's verdicts equal `dupSpans` over that prefix
  * restricted to the slice's documents; feed it in one batch and the
  * verdicts equal the full batch run exactly. Span reassembly
  * (gaps-and-islands over a document's duplicated positions) is
  * stateless per document and left to the consumer, as with the other
  * twins' verdict streams.
  *
  * Scale posture: state is ONE saturating counter per distinct gram —
  * the same cardinality the batch operator's (gram → count) hash
  * aggregate shuffles, held incrementally instead of rebuilt per run;
  * `ttl` evicts grams untouched for the duration, bounding state to the
  * working set (dedup against a sliding window of the crawl). Requires
  * the RocksDB state store provider (`transformWithState`). */
object StatefulSubstringDedup {

  private class GramProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, GramOcc, GramVerdict] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[GramOcc],
        timerValues: TimerValues): Iterator[GramVerdict] = {
      val occs = rows.toArray
      val before = if (seen.exists()) seen.get() else 0L
      val after = math.min(before + occs.length, 2L)
      seen.update(after)
      val dup = if (after >= 2L) 1L else 0L
      occs.sortBy(o => (o.id, o.p)).iterator
        .map(o => GramVerdict(o.id, o.p, key, dup))
    }
  }

  /** Gram-occurrence stream → verdict stream. `ttl = None` counts over
    * the full history (exact parity with the batch operator); a TTL
    * bounds state to the working set and forces processing-time mode. */
  def verdicts(ds: Dataset[GramOcc],
      ttl: Option[java.time.Duration] = None): Dataset[GramVerdict] = {
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val outEnc = Encoders.product[GramVerdict]
    ds.groupByKey(_.gram)(Encoders.STRING)
      .transformWithState(new GramProcessor(cfg), mode, OutputMode.Append())
  }
}
