package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.streaming.StreamingQueryProgress

/** Per-stage survivor accounting for a STREAMING curation chain — the
  * streaming twin of [[graft.pipeline.SpecLoader.funnelFromJson]]'s
  * batch funnel (the `curation_funnel` audit): every stage boundary
  * gets a named `observe` counter, so each micro-batch reports every
  * stage's row count through the engine's own metrics channel
  * (`StreamingQueryProgress.observedMetrics`) — zero extra actions,
  * zero extra passes, no plan change beyond a CollectMetrics node.
  *
  * This is the Spark-idiomatic form of the audit at 100 TB: the counts
  * ride the batches the chain already pays for (exactly as the batch
  * funnel rides its checkpoints), a listener ships them to monitoring,
  * and a stage that silently eats the corpus is visible per batch, not
  * at end-of-job.
  *
  * Stage vocabulary: the same `(op, DataFrame => DataFrame)` pairs as
  * the batch chain ([[graft.pipeline.SpecLoader.stagesFromJson]]) for
  * STATELESS stages (normalize / quality_filter / project / filter —
  * one declared JSON drives both engines); stateful batch stages
  * (line_dedup, exact_dedup, winnow_dedup …) must be substituted with
  * their transformWithState twins by the caller, which is the existing
  * streaming-twin contract.
  *
  * Parity (pinned in StreamingFunnelSpec): stateless stage counts
  * summed over micro-batches equal the batch funnel on the same rows
  * under ANY slicing; a stateful twin's counts equal the batch stage
  * when its own parity contract holds (e.g. line dedup fed one corpus
  * in one batch, or prefix semantics across batches). */
object StreamingFunnel {

  private val Prefix = "funnel_"

  /** Chain `stages` over `df` with a per-boundary observe counter.
    * Metric names are `funnel_<idx>_<op>` with a zero-padded index so
    * lexicographic order IS stage order; stage 000 is the raw input. */
  def observed(df: DataFrame,
      stages: Seq[(String, DataFrame => DataFrame)]): DataFrame = {
    var cur = df.observe(s"${Prefix}000_input", count(lit(1)).as("rows"))
    stages.zipWithIndex.foreach { case ((op, f), i) =>
      cur = f(cur).observe(f"$Prefix${i + 1}%03d_$op",
        count(lit(1)).as("rows"))
    }
    cur
  }

  /** Fold a query's progress log into the funnel: per stage, the SUM of
    * its per-batch observed counts → (stage, op, rows_out), stage 0 the
    * raw input. Pass `query.recentProgress` in tests; a production job
    * feeds the same entries through a StreamingQueryListener (the
    * recentProgress buffer is bounded). No-data batches carry no
    * observed metrics and fold in as zero. */
  private val Shape = s"$Prefix(\\d{3})_(.+)".r

  def funnel(progress: Seq[StreamingQueryProgress])
      : Seq[(Int, String, Long)] = {
    val sums = scala.collection.mutable.Map.empty[String, Long]
    progress.foreach { p =>
      p.observedMetrics.asScala.foreach { case (name, row) =>
        // fold ONLY names with the exact observed() shape
        // funnel_<3-digit idx>_<op>: the \d{3} requirement means a job's
        // own observe metrics (even funnel_-prefixed ones like
        // `funnel_5_custom`) never fold into the funnel, and every name
        // that DOES fold carries the zero-padded index whose
        // lexicographic order is stage order
        if (Shape.pattern.matcher(name).matches())
          sums(name) = sums.getOrElse(name, 0L) + row.getLong(0)
      }
    }
    sums.toSeq.sorted.map { case (name, n) =>
      val Shape(idx, op) = name
      (idx.toInt, op, n)
    }
  }
}
