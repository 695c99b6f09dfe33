package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Versioned MULTI-TABLE model registry with atomic promotion and
  * rollback — the production artifact store for the frozen-model tiers
  * (pruned-KN LM: six tables; Naive-Bayes classifier: three tables; ANN
  * index: centroids + codebook + assignments).
  *
  * Why [[SnapshotStore.commitTable]] alone is not enough: each table
  * commit is individually atomic, but a model is a SET of tables with a
  * cross-table consistency invariant (e.g. the NB grams table must count
  * exactly the docs the classes table counts). A refresh that re-commits
  * the tables one by one opens a window where a scorer reads grams vN+1
  * next to classes vN — per-table atomicity, torn MODEL. The registry
  * closes it with the classic manifest-swap discipline (the same shape
  * Delta/Iceberg use for multi-file snapshots, and the multi-table analog
  * of the reference's all-functions-then-commit sync loop,
  * `main.go:224-237` + `recon.go:102-131`):
  *
  *  - `root/<model>/v-<n>/<table>/` — version dirs, parquet, written
  *    COMPLETELY before promotion and immutable afterwards;
  *  - `root/<model>/manifest/` — an [[AtomicTable]] holding ONE row
  *    `(version, prev_version, max_version)`; promotion = one pointer
  *    swap. Readers resolve the manifest once ([[snapshot]]) and read
  *    every table from that version dir — a concurrent refresh can
  *    promote vN+1 mid-scan and the pinned reader still sees a
  *    consistent vN (version dirs outlive their demotion by one full
  *    promote cycle, the [[AtomicTable]] GC rule).
  *
  * Rollback ([[rollback]]) re-promotes `prev_version` with another
  * manifest swap — pure metadata, no data rewrite; one step of history
  * is retained (the AtomicTable contract). `max_version` keeps version
  * numbers strictly increasing across rollbacks so a post-rollback
  * publish can never collide with a demoted version dir.
  *
  * Single-writer model (refreshes are driver-scheduled, serialized);
  * readers are unlimited. Filesystem contract inherited from
  * [[AtomicTable]]: HDFS-semantics atomic create — front an object store
  * with a real table format instead. */
class ModelRegistry(spark: SparkSession, root: String) {

  private val ManifestSchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("prev_version", LongType, nullable = false),
    StructField("max_version", LongType, nullable = false)))

  private def manifest(model: String): AtomicTable =
    new AtomicTable(spark, s"$root/$model/manifest")

  private def versionDir(model: String, version: Long) =
    s"$root/$model/v-$version"

  private def fs: FileSystem = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestRow(model: String): Option[(Long, Long, Long)] = {
    val rows = manifest(model).read(ManifestSchema).collect()
    if (rows.isEmpty) None
    else Some((rows(0).getLong(0), rows(0).getLong(1), rows(0).getLong(2)))
  }

  /** Currently promoted version; 0 if the model was never published. */
  def currentVersion(model: String): Long =
    manifestRow(model).map(_._1).getOrElse(0L)

  /** Write every table of a NEW version completely, then promote it with
    * one manifest swap. Returns the promoted version number. Version
    * dirs other than the new current and its predecessor are
    * best-effort GC'd — the READER-LEASE CONTRACT: a reader pinned on
    * the outgoing version gets exactly ONE full promote cycle to
    * finish. A [[Pinned]] held across TWO promotions points at a GC'd
    * dir and fails its next `table` read loudly (pinned by name in
    * ModelRegistrySpec); a refresh scheduler must bound scan time below
    * its promote cadence, or widen the keep set with a real table
    * format's snapshot retention.
    *
    * Single-writer ENFORCED, not just assumed, in two layers:
    *
    *  1. the publisher claims `publish-lock-<v>` with an atomic
    *     create-if-absent before writing anything; a concurrent
    *     publisher racing for the same version FAILS LOUDLY instead of
    *     silently losing the manifest race (two writers allocating the
    *     same version would otherwise both "succeed" with one artifact
    *     silently discarded — the failure mode refresh schedulers
    *     actually hit);
    *  2. the lock is re-validated AFTER the claim: the lock file is
    *     deleted once its publisher promotes, so a slow competitor that
    *     read the manifest BEFORE that promote could claim the freed
    *     lock number afterwards and `Overwrite` the just-promoted,
    *     supposedly immutable `v-<v>` dirs under pinned readers. Version
    *     numbers are never reused (`max_version` is monotone), so the
    *     claimer re-reads the manifest and fails loudly if
    *     `max_version` advanced past what it allocated from.
    *
    * A publisher that crashed mid-write leaves its lock behind; the
    * next publish names the stale lock in its error so an operator can
    * inspect-and-remove — deliberate manual recovery, matching the
    * registry's driver-scheduled refresh contract. For schedulers that
    * cannot page an operator, `staleLockMs` bounds the wait: a lock
    * older than the budget is broken and re-claimed atomically
    * (create-if-absent again, so two recovering publishers cannot both
    * win). Overwriting a crashed publisher's PARTIAL version dir is
    * safe — it was never promoted, so no reader ever resolved it. */
  def publish(model: String, tables: Seq[(String, DataFrame)],
      staleLockMs: Long = Long.MaxValue): Long = {
    require(tables.nonEmpty, s"publish($model): no tables")
    val (_, _, maxv) = manifestRow(model).getOrElse((0L, 0L, 0L))
    val v = maxv + 1
    onBeforeClaim(model, v)
    val lock = new Path(s"$root/$model/publish-lock-$v")
    val f = fs
    f.mkdirs(lock.getParent)
    if (!f.createNewFile(lock)) {
      val ageMs = System.currentTimeMillis -
        f.getFileStatus(lock).getModificationTime
      require(ageMs > staleLockMs,
        s"publish($model): version $v is already being published " +
          s"(concurrent publisher, or a crashed one — inspect and " +
          s"remove $lock to recover, or pass staleLockMs < $ageMs to " +
          "break the stale lock)")
      f.delete(lock, false)
      require(f.createNewFile(lock),
        s"publish($model): lost the claim race for version $v while " +
          s"breaking a stale lock — a live publisher re-claimed $lock")
    }
    try {
      // post-claim re-validation (layer 2 above): allocate-from state
      // must still be the head, or this claim recycles a released lock
      val now = manifestRow(model).getOrElse((0L, 0L, 0L))
      require(now._3 == maxv,
        s"publish($model): lost the publish race for version $v — the " +
          s"manifest advanced to max_version=${now._3} after this " +
          "publisher read it (a competitor promoted first); retry to " +
          "publish against the new head")
      tables.foreach { case (name, df) =>
        df.write.mode(SaveMode.Overwrite)
          .parquet(s"${versionDir(model, v)}/$name")
      }
      promote(model, version = v, prev = now._1, maxv = v,
        keep = Set(v, now._1))
    } finally f.delete(lock, false)
    v
  }

  /** Test seam: called between the manifest read that allocates the new
    * version number and the lock claim — the recycled-lock race window
    * (a competitor can read, write, promote and release entirely inside
    * it, freeing the lock name this publisher is about to claim).
    * No-op in production; ModelRegistrySpec overrides it to replay the
    * race deterministically. */
  protected def onBeforeClaim(model: String, version: Long): Unit = ()

  /** Re-promote the previous version — pure manifest metadata, the data
    * dirs are untouched. Fails loudly if there is no history to restore
    * (never published, or already rolled back past the retained step). */
  def rollback(model: String): Long = {
    val (cur, prev, maxv) = manifestRow(model).getOrElse(
      throw new IllegalStateException(
        s"rollback($model): model never published"))
    require(prev > 0, s"rollback($model): no previous version to " +
      s"restore (current v$cur is the oldest retained)")
    // the demoted current stays on disk one promote cycle (keep set) so
    // a reader pinned on it mid-scan finishes; prev_version=0 records
    // that history is exhausted (a second rollback fails loudly)
    promote(model, version = prev, prev = 0L, maxv = maxv,
      keep = Set(prev, cur))
    prev
  }

  private def promote(model: String, version: Long, prev: Long,
      maxv: Long, keep: Set[Long]): Unit = {
    manifest(model).commit(spark.createDataFrame(
      java.util.List.of(Row(version, prev, maxv)), ManifestSchema)
      .coalesce(1))
    gc(model, keep = keep.filter(_ > 0))
  }

  /** Delete version dirs not in `keep` (best-effort, same contract as
    * [[AtomicTable]]'s GC). */
  private def gc(model: String, keep: Set[Long]): Unit = {
    val base = new Path(s"$root/$model")
    val f = fs
    if (!f.exists(base)) return
    val VDir = "v-([0-9]+)".r
    f.listStatus(base).foreach { st =>
      st.getPath.getName match {
        case VDir(n) if !keep.contains(n.toLong) =>
          try f.delete(st.getPath, true) catch { case _: Exception => }
        case _ => ()
      }
    }
  }

  /** Pin the currently promoted version. Every [[Pinned.table]] read
    * resolves against the SAME immutable version dir — consistent across
    * tables by construction, stable under concurrent refresh. */
  def snapshot(model: String): Pinned = {
    val v = currentVersion(model)
    require(v > 0, s"snapshot($model): model never published")
    Pinned(model, v)
  }

  /** A pinned model version: `table(name)` reads from the immutable
    * `v-<version>` dir. */
  final case class Pinned(model: String, version: Long) {
    def table(name: String): DataFrame = {
      val dir = s"${versionDir(model, version)}/$name"
      require(fs.exists(new Path(dir)),
        s"model table $dir missing from published version $version")
      spark.read.parquet(dir)
    }
  }
}
