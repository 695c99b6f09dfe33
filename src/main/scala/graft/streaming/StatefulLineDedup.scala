package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One fixed-width line occurrence of a streaming document — the
  * [[graft.operators.TextAnalysis.fixedWidthLines]] projection
  * (stateless, so it composes onto a doc stream unchanged): `line` the
  * width-word segment, `id` the document, `pos` its position. */
case class LineOcc(line: String, id: Long, pos: Long)

/** A streaming line-dedup verdict: `kept` = 1 iff the line's document
  * frequency THROUGH THE END of the arrival's micro-batch is at or
  * below the cap — the arrival-order form of CCNet's batch-global
  * boilerplate rule. */
case class LineVerdict(id: Long, pos: Long, line: String, kept: Long)

/** Streaming CCNet line dedup: the stateful twin of
  * [[graft.operators.TextAnalysis.lineDedup]] for an unbounded document
  * stream — completing the streaming story the LSH / SemDeDup twins
  * started. State lives per LINE: a single `ValueState` count of
  * distinct documents seen so far (a streaming document arrives exactly
  * once, so each micro-batch's distinct doc ids are all new — the same
  * unique-id stream contract as [[StatefulSemDedup]]).
  *
  * Parity contract (pinned in StreamingLineDedupSpec): the batch rule
  * is GLOBAL — a line's doc frequency counts the whole corpus — so a
  * one-pass processor twins the batch operator run over everything seen
  * THROUGH THE END of the arrival's micro-batch: every occurrence in a
  * batch gets the post-batch frequency (batch `countDistinct` counts
  * the arriving docs too). Feed the corpus one doc per micro-batch and
  * each doc's verdicts equal `lineDedup` over that prefix; feed it in
  * one batch and the verdicts equal the full batch run exactly.
  * Per-doc reassembly (`kept_text`) is an ordered concat over this
  * verdict stream — stateless per document, left to the consumer, as
  * with the other twins' verdict streams.
  *
  * Scale posture: state is ONE counter per distinct line (the count
  * saturates logically at `maxDocFreq + 1` — beyond it verdicts can
  * never change back); `ttl` evicts lines untouched for the duration,
  * bounding state to the working set (dedup against a sliding window of
  * the crawl). Requires the RocksDB state store provider
  * (`transformWithState`). */
object StatefulLineDedup {

  private class LineProcessor(ttl: TTLConfig, maxDocFreq: Int)
      extends StatefulProcessor[String, LineOcc, LineVerdict] {
    @transient private var docFreq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docFreq = getHandle.getValueState[Long]("docFreq",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[LineOcc],
        timerValues: TimerValues): Iterator[LineVerdict] = {
      val occs = rows.toArray
      val before = if (docFreq.exists()) docFreq.get() else 0L
      // saturate at cap+1: beyond it the verdict can never change back,
      // so the stored counter needs no further growth
      val after = math.min(before + occs.map(_.id).distinct.length,
        maxDocFreq + 1L)
      docFreq.update(after)
      val kept = if (after <= maxDocFreq) 1L else 0L
      occs.sortBy(o => (o.id, o.pos)).iterator
        .map(o => LineVerdict(o.id, o.pos, key, kept))
    }
  }

  /** Line-occurrence stream → verdict stream. `ttl = None` counts over
    * the full history (exact parity with the batch operator); a TTL
    * bounds state to the working set and forces processing-time mode. */
  def verdicts(ds: Dataset[LineOcc], maxDocFreq: Int,
      ttl: Option[java.time.Duration] = None): Dataset[LineVerdict] = {
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val outEnc = Encoders.product[LineVerdict]
    ds.groupByKey(_.line)(Encoders.STRING)
      .transformWithState(new LineProcessor(cfg, maxDocFreq), mode,
        OutputMode.Append())
  }
}
