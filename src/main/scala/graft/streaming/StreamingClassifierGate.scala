package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.NaiveBayes
import graft.operators.NaiveBayes.NbcFrozenModel

/** Streaming language-ID gate against a FROZEN trained classifier — the
  * streaming twin of the declarable `lang_gate` stage: each arriving
  * document is classified locally against the broadcast
  * [[NbcFrozenModel]] ([[NaiveBayes.nbcClassifyLocal]], bit-identical to
  * the distributed [[NaiveBayes.nbcClassify]]) and kept iff its
  * predicted class is in the keep-set — the CCNet crawl front door
  * (Wenzek et al. 2020 routes every document through a pretrained
  * fastText lang-id model before anything else runs).
  *
  * Same shape rationale as [[StreamingLmGate]]: a per-doc classification
  * is an aggregate over the doc's grams joined against the model tables,
  * which an append-mode stream cannot express without a watermarked
  * shuffle per batch; shipping the frozen model (vocab×|langs|-bounded,
  * never corpus-sized) to executors and classifying rows locally is what
  * production gates do. The lambda is a typed Dataset filter — same
  * family as the transformWithState twins, not a SQL UDF in an
  * expression tree. */
object StreamingClassifierGate {

  def gate(df: DataFrame, textCol: String, model: NbcFrozenModel,
      keep: Set[String]): DataFrame = {
    require(keep.nonEmpty, "classifier gate keep-set must be non-empty")
    val idx = df.schema.fieldIndex(textCol)
    df.filter(r =>
      keep(NaiveBayes.nbcClassifyLocal(r.getString(idx), model)._1))
  }

  /** Margin-threshold twin of [[NaiveBayes.nbcMarginGate]]: keep rows
    * the frozen model classifies as `keepClass` with a decision margin
    * of at least `minMarginMicros` — the GPT-3 quality cut running
    * per-row against the broadcast artifact
    * ([[NaiveBayes.nbcMarginLocal]], bit-identical to the distributed
    * margins). */
  def marginGate(df: DataFrame, textCol: String, model: NbcFrozenModel,
      keepClass: String, minMarginMicros: Long): DataFrame = {
    val idx = df.schema.fieldIndex(textCol)
    df.filter { r =>
      val (pred, margin) =
        NaiveBayes.nbcMarginLocal(r.getString(idx), model)
      pred == keepClass && margin >= minMarginMicros
    }
  }
}
