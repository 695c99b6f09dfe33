package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.StructType

/** One fixed-width line occurrence carrying its document's OTHER columns
  * as a JSON blob — the generic carry that lets the doc-level twin ride
  * any input schema through the typed stages and restore it after. */
case class DocOcc(line: String, id: Long, pos: Long, extra: String)

case class DocVerdict(id: Long, pos: Long, line: String, extra: String,
    kept: Long)

/** A document rebuilt from its kept lines. */
case class RebuiltDoc(id: Long, kept_text: String, extra: String)

/** DOCUMENT-level streaming CCNet line dedup — the stateful twin of the
  * declarable `line_dedup` STAGE ([[graft.pipeline.SpecLoader]]): where
  * [[StatefulLineDedup]] twins the line-VERDICT operator, this composes
  * the full stage contract onto a doc stream: text is rebuilt from the
  * lines that clear the cross-document frequency cap (pos-ordered,
  * space-joined — byte-identical to the batch stage's reassembly), every
  * other column rides through, and docs whose every line is boilerplate
  * drop out.
  *
  * Shape: a stateless explode (the [[graft.operators.TextAnalysis
  * .fixedWidthLines]] segmentation with the doc's other columns packed
  * into one `to_json` blob), the per-LINE doc-frequency processor
  * (identical transition to [[StatefulLineDedup]] — state is one
  * saturating counter per distinct line), then a per-DOC reassembly
  * processor. The reassembly holds NO state: a streaming document
  * arrives exactly once, so all its occurrences share one micro-batch
  * and regrouping them is a per-batch shuffle, not an aggregation over
  * time — which is why this composes in append mode where a windowless
  * groupBy could not.
  *
  * Parity contract (pinned in StreamingFunnelSpec's mixed chain): fed
  * the corpus in ONE batch, stage output equals the batch `line_dedup`
  * stage row-for-row; sliced feeds follow [[StatefulLineDedup]]'s
  * through-batch prefix semantics. */
object StatefulDocLineDedup {

  private class LineProcessor(ttl: TTLConfig, maxDocFreq: Int)
      extends StatefulProcessor[String, DocOcc, DocVerdict] {
    @transient private var docFreq: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      docFreq = getHandle.getValueState[Long]("docFreq",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[DocOcc],
        timerValues: TimerValues): Iterator[DocVerdict] = {
      val occs = rows.toArray
      val before = if (docFreq.exists()) docFreq.get() else 0L
      val after = math.min(before + occs.map(_.id).distinct.length,
        maxDocFreq + 1L)
      docFreq.update(after)
      val kept = if (after <= maxDocFreq) 1L else 0L
      occs.iterator.map(o => DocVerdict(o.id, o.pos, key, o.extra, kept))
    }
  }

  /** Zero-state per-doc reassembly: all of a doc's verdicts arrive in
    * its own micro-batch (unique-arrival stream contract), so the
    * processor just regroups the batch. Docs with no kept line emit
    * nothing — the stage's drop-empty contract. */
  private class ReassembleProcessor
      extends StatefulProcessor[Long, DocVerdict, RebuiltDoc] {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ()

    override def handleInputRows(key: Long, rows: Iterator[DocVerdict],
        timerValues: TimerValues): Iterator[RebuiltDoc] = {
      val vs = rows.toArray
      val kept = vs.filter(_.kept == 1L).sortBy(_.pos)
      if (kept.isEmpty) Iterator.empty
      else Iterator.single(RebuiltDoc(key,
        kept.map(_.line).mkString(" "), vs.head.extra))
    }
  }

  /** The composed doc-level stage: (idCol, textCol, rest...) stream in,
    * same schema out with `textCol` rebuilt and empty docs dropped.
    * `width`/`maxDocFreq` as in the batch stage. Requires the RocksDB
    * state store provider (`transformWithState`). */
  def stage(df: DataFrame, textCol: String, idCol: String, width: Int,
      maxDocFreq: Int, ttl: Option[java.time.Duration] = None)
      : DataFrame = {
    require(width >= 1, s"width=$width")
    val restSchema = StructType(
      df.schema.filterNot(f => f.name == textCol || f.name == idCol))
    val packed = df.select(col(idCol).cast("long").as("id"),
      graft.operators.TextAnalysis.wsTokens(col(textCol)).as("__w"),
      to_json(struct(restSchema.map(f => col(f.name)): _*)).as("extra"))
    implicit val occEnc = Encoders.product[DocOcc]
    val occs = packed.select(col("id"), col("extra"), posexplode(expr(
        ("transform(sequence(0, (size(__w) - 1) DIV W), " +
          "i -> concat_ws(' ', slice(__w, i * W + 1, W)))")
          .replace("W", width.toString))).as(Seq("pos", "line")))
      .select(col("line"), col("id"), col("pos").cast("long").as("pos"),
        col("extra")).as[DocOcc]
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime()
      else TimeMode.None()
    implicit val vEnc = Encoders.product[DocVerdict]
    implicit val rEnc = Encoders.product[RebuiltDoc]
    val verdicts = occs.groupByKey(_.line)(Encoders.STRING)
      .transformWithState(new LineProcessor(cfg, maxDocFreq), mode,
        OutputMode.Append())
    val rebuilt = verdicts.groupByKey(_.id)(Encoders.scalaLong)
      .transformWithState(new ReassembleProcessor, TimeMode.None(),
        OutputMode.Append())
    // restore the original schema and column ORDER
    val restored = rebuilt.toDF()
      .withColumn("__rest", from_json(col("extra"), restSchema))
    restored.select(df.schema.map { f =>
      if (f.name == idCol) col("id").cast(df.schema(idCol).dataType)
        .as(idCol)
      else if (f.name == textCol) col("kept_text").as(textCol)
      else col(s"__rest.${f.name}").as(f.name)
    }: _*)
  }
}
