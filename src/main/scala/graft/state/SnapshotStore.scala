package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Schemas

/** Parquet-backed keyed snapshot state — the durable, distributed form of
  * the reference's in-memory `integration → function → external_id → [crc32]`
  * map (reference `internal/recon/recon.go:13`).
  *
  * Layout: one [[AtomicTable]] per (integration, function) —
  * `root/<integration>/<function>/`. Keeping each operator's state in its
  * own table is the analog of the reference's two-level map lookup: the
  * diff for one function scans only that function's keys, never the whole
  * state.
  *
  * Two-phase commit (reference `recon.go:66-69` pure-Reconcile vs
  * `recon.go:102-131` mutating-Commit): [[read]] always serves the last
  * committed image; [[commit]] publishes the post-image via the
  * crash-safe pointer swap in [[AtomicTable]]. A crash between sink write
  * and commit re-syncs the same delta — safe, because the sink is
  * idempotent (MERGE semantics), which is the reference's own
  * at-least-once story.
  *
  * Scale: the post-image can be written `repartition(key)` so state
  * parquet is hash-clustered by key; at 1000-executor scale the reconcile
  * join reads state co-partitioned with the batch's own hash partitioning,
  * and AQE broadcasts whichever side turns out small.
  */
class SnapshotStore(spark: SparkSession, root: String) {

  private def table(integration: String, function: String): AtomicTable =
    new AtomicTable(spark, s"$root/$integration/$function")

  /** Last committed state image; empty (with schema) before first commit. */
  def read(integration: String, function: String): DataFrame =
    table(integration, function).read(Schemas.state)

  /** Atomically replace the state with `postImage` (key, hash). */
  def commit(integration: String, function: String, postImage: DataFrame,
      partitions: Int = 0): Unit = {
    val img = if (partitions > 0)
      postImage.repartition(partitions, postImage(Schemas.externalId))
    else postImage
    table(integration, function).commit(img)
  }

  /** Arbitrary-schema table commit — the persistence path for FROZEN
    * MODEL artifacts (e.g. the pruned-KN tables of
    * [[graft.operators.TextAnalysis.kn3StoreModel]]), which share the
    * reconcile state's crash-safe pointer-swap publish but not its
    * (key, hash) schema. A scoring job reading mid-commit sees the old
    * model, never a torn one. */
  def commitTable(integration: String, name: String, df: DataFrame): Unit =
    table(integration, name).commit(df)

  /** Read back a [[commitTable]] artifact; schema comes from the stored
    * parquet footer (models are always committed before they are read —
    * a missing table is a caller bug and fails loudly). */
  def readTable(integration: String, name: String): DataFrame = {
    val t = table(integration, name)
    require(t.exists, s"model table $root/$integration/$name never committed")
    t.read(null)
  }
}
