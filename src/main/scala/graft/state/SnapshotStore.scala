package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.model.Schemas

/** Parquet-backed keyed snapshot state — the durable, distributed form of
  * the reference's in-memory `integration → function → external_id → [crc32]`
  * map (reference `internal/recon/recon.go:13`).
  *
  * Layout: one directory per (integration, function) —
  * `root/<integration>/<function>/current`. Keeping each operator's state in
  * its own directory is the analog of the reference's two-level map lookup:
  * the diff for one function scans only that function's keys, never the
  * whole state.
  *
  * Two-phase commit (reference `recon.go:66-69` pure-Reconcile vs
  * `recon.go:102-131` mutating-Commit): [[read]] always serves the last
  * committed image; [[commit]] writes the post-image to a staging directory
  * and atomically renames it over `current`. A crash between sink write and
  * commit re-syncs the same delta — safe, because the sink is idempotent
  * (MERGE semantics), which is the reference's own at-least-once story.
  *
  * Scale: the post-image is written `repartition(key)` so state parquet is
  * hash-clustered by key; at 1000-executor scale the reconcile join reads
  * state co-partitioned with the batch's own hash partitioning, and AQE
  * broadcasts whichever side turns out small.
  */
class SnapshotStore(spark: SparkSession, root: String) {

  private def dir(integration: String, function: String): String =
    s"$root/$integration/$function"

  private def fs = new Path(root).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** Last committed state image; empty (with schema) before first commit. */
  def read(integration: String, function: String): DataFrame = {
    val cur = new Path(dir(integration, function), "current")
    if (fs.exists(cur)) spark.read.schema(Schemas.state).parquet(cur.toString)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), Schemas.state)
  }

  /** Atomically replace the state with `postImage` (key, hash). */
  def commit(integration: String, function: String, postImage: DataFrame,
      partitions: Int = 0): Unit = {
    val base = dir(integration, function)
    val staged = new Path(base, s"staged-${java.util.UUID.randomUUID()}")
    val cur = new Path(base, "current")
    val old = new Path(base, s"old-${java.util.UUID.randomUUID()}")
    val img = if (partitions > 0)
      postImage.repartition(partitions, postImage(Schemas.externalId))
    else postImage
    img.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val f = fs
    if (f.exists(cur))
      require(f.rename(cur, old), s"state swap failed: $cur -> $old")
    require(f.rename(staged, cur), s"state swap failed: $staged -> $cur")
    if (f.exists(old)) f.delete(old, true)
  }
}
