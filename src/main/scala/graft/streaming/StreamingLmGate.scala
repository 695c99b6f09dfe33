package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.Kn3FrozenModel

/** Streaming CCNet perplexity gate against a FROZEN LM — the streaming
  * twin of the declarable `lm_apply` stage: each arriving document is
  * scored locally against the broadcast [[Kn3FrozenModel]]
  * ([[TextAnalysis.kn3ScoreLocal]], bit-identical to the distributed
  * [[TextAnalysis.kn3Score]]) and kept iff its mean token log-prob
  * clears the floor; unscorable (< 3 token) docs drop, as in the batch
  * stage.
  *
  * Why a typed per-row filter and not Column algebra: a per-doc score is
  * an aggregate over the doc's trigrams joined against five model
  * tables; in append-mode streaming that is a windowless aggregation
  * Spark rightly refuses. Shipping the frozen model to executors and
  * scoring rows locally is exactly what production gates do (KenLM's
  * mmap'd binary on every worker); the model is bounded by the pruned
  * kept-type set, and Spark's task broadcast amortizes one copy per
  * executor. The lambda is a typed Dataset filter — same family as the
  * transformWithState twins, not a SQL UDF in an expression tree. */
object StreamingLmGate {

  def gate(df: DataFrame, textCol: String, model: Kn3FrozenModel,
      floorPermille: Long): DataFrame = {
    val idx = df.schema.fieldIndex(textCol)
    df.filter(r =>
      TextAnalysis.kn3ScoreLocal(r.getString(idx), model)
        .exists(_ >= floorPermille))
  }
}
