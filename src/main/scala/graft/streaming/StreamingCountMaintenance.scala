package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.operators.TextAnalysis
import graft.state.AtomicTable

/** Continuous n-gram count maintenance — the streaming twin of the
  * `kn_counts_ivm` / `kn_refresh` batch loop: every micro-batch of
  * (doc, op ∈ {+1, −1}) changelog rows folds into the PERSISTENT
  * trigram-count table ([[TextAnalysis.maintainTrigramCounts]]), and
  * the refreshed pruned-KN model is derivable from the stored table at
  * any batch boundary ([[TextAnalysis.kn3ModelFromCounts]]) — the LM
  * stays current with the crawl at delta-tokenization cost, never a
  * corpus re-scan.
  *
  * Replay safety WITHOUT idempotence: count maintenance is an additive
  * fold — replaying a batch against post-batch state would double-count,
  * so the MERGE-absorbs-replays story of the sync sinks does not apply.
  * Instead the state table is versioned BY BATCH ID
  * ([[AtomicTable.commitAt]] at counter batchId+1): a batch reads the
  * image with the highest counter ≤ its own batchId
  * ([[AtomicTable.readUpTo]]) — the image its ORIGINAL attempt read,
  * never the one it wrote — recomputes the same deterministic fold, and
  * re-publishes the same counter. A crash between the state commit and
  * the streaming checkpoint therefore replays into a harmless duplicate
  * version of identical data (pinned in StreamingCountMaintenanceSpec).
  * This is the foreachBatch transactional-sink idiom, with the version
  * counter doubling as the transaction id. */
object StreamingCountMaintenance {

  val stateSchema: StructType = StructType(Seq(
    StructField("s", StringType), StructField("c123", LongType)))

  /** One micro-batch application — exposed so fault-injection tests
    * (and callers embedding the maintenance in a larger foreachBatch
    * body) run exactly the production fold. */
  def applyBatch(table: AtomicTable, batch: DataFrame, batchId: Long,
      textCol: String, idCol: String, opCol: String): Unit = {
    val state = table.readUpTo(batchId, stateSchema)
    table.commitAt(batchId + 1, TextAnalysis.maintainTrigramCounts(
      state, batch, textCol, idCol, opCol))
  }

  /** Start maintaining `stateDir` from a (textCol, idCol, opCol)
    * changelog stream. Empty batches commit nothing (batch-id gaps are
    * safe: reads resolve to the highest committed version ≤ batchId,
    * and [[AtomicTable.commitAt]] GCs by the actual previous counter). */
  def start(docs: DataFrame, textCol: String, idCol: String,
      opCol: String, stateDir: String,
      checkpoint: String): StreamingQuery = {
    val table = new AtomicTable(docs.sparkSession, stateDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyBatch(table, batch, batchId, textCol, idCol, opCol)
      }
      .start()
  }

  // ---- classifier-count variant -------------------------------------
  // Same batch-versioned replay-safety machinery over the Naive-Bayes
  // per-class gram-count table ([[graft.operators.NaiveBayes
  // .maintainGramCounts]]) — the `nbc_counts_ivm` / `nbc_refresh` loop
  // made continuous: the frozen lang-id gate's model is derivable from
  // the stored table at any batch boundary
  // ([[graft.operators.NaiveBayes.nbcModelFromCounts]]).

  val classifierStateSchema: StructType = StructType(Seq(
    StructField("lang", StringType), StructField("g", StringType),
    StructField("c", LongType)))

  def applyClassifierBatch(table: AtomicTable, batch: DataFrame,
      batchId: Long, textCol: String, labelCol: String,
      opCol: String): Unit = {
    val state = table.readUpTo(batchId, classifierStateSchema)
    table.commitAt(batchId + 1, graft.operators.NaiveBayes
      .maintainGramCounts(state, batch, textCol, labelCol, opCol))
  }

  def startClassifier(docs: DataFrame, textCol: String, labelCol: String,
      opCol: String, stateDir: String,
      checkpoint: String): StreamingQuery = {
    val table = new AtomicTable(docs.sparkSession, stateDir)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          applyClassifierBatch(table, batch, batchId, textCol, labelCol,
            opCol)
      }
      .start()
  }
}
