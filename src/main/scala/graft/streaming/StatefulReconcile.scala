package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.Crc32Q

/** Keyed record entering the changelog reconciler: `token` is the
  * change-detection token (the reference's F2 chain output); `tombstone`
  * marks an upstream deletion. */
case class KeyedRecord(external_id: String, token: String,
    tombstone: Boolean = false)

/** Emitted change event — the reconciler's delta as a stream
  * (`op` ∈ create/delete, matching reference `recon.go:79-96`; updates are
  * creates, reference `recon.go:81-84`). */
case class ChangeEvent(external_id: String, op: String, hash: Long)

/** Streaming-native form of the reconciler (SURVEY §2.8): per-key hash
  * state lives in Spark's state store via `flatMapGroupsWithState`, so an
  * unbounded keyed stream is diffed incrementally — no snapshot table, no
  * per-batch full join.
  *
  * Relation to [[graft.operators.Reconcile]]: the batch operator diffs a
  * complete snapshot per micro-batch (absence ⇒ delete, reference
  * semantics); this operator consumes a changelog where deletions are
  * explicit tombstones — the shape an unbounded stream can actually
  * provide. Hash semantics are identical (CRC32-Q over the token,
  * reference `recon.go:133-156`): a key whose token hash is unchanged
  * emits nothing; new/changed emit `create`; tombstone of a live key emits
  * `delete`.
  *
  * Scale: state is partitioned by key across executors (state store), each
  * micro-batch shuffles only its own records; checkpointing makes the
  * operator restart-safe. This is exactly the 100 TB shape — state never
  * materializes in one place.
  */
object StatefulReconcile {

  /** The per-group transition: fold this micro-batch's records for one key
    * over the stored hash. */
  private def transition(key: String, records: Iterator[KeyedRecord],
      state: GroupState[Long]): Iterator[ChangeEvent] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[ChangeEvent]
    records.foreach { r =>
      if (r.tombstone) {
        if (state.exists) {
          out += ChangeEvent(key, "delete", state.get)
          state.remove()
        }
      } else {
        val h = Crc32Q.computeUtf8(r.token)
        if (!state.exists || state.get != h) {
          out += ChangeEvent(key, "create", h)
          state.update(h)
        }
      }
    }
    out.iterator
  }

  /** Apply to a (streaming or batch) Dataset of [[KeyedRecord]].
    * Legacy-API form (`flatMapGroupsWithState`); [[changelogTws]] is the
    * Spark-4 `transformWithState` form with state TTL. */
  def changelog(ds: Dataset[KeyedRecord]): Dataset[ChangeEvent] = {
    implicit val evEnc = Encoders.product[ChangeEvent]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.external_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(transition)
  }

  /** The same transition as a Spark-4 [[StatefulProcessor]]. One
    * `ValueState[Long]` named "hash" holds the per-key CRC32-Q; the fold
    * over a micro-batch's records is byte-identical to [[transition]]
    * (parity asserted in StatefulReconcileSpec). */
  private class ReconcileProcessor(ttl: TTLConfig)
      extends StatefulProcessor[String, KeyedRecord, ChangeEvent] {
    @transient private var hash: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hash = getHandle.getValueState[Long]("hash", Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[KeyedRecord],
        timerValues: TimerValues): Iterator[ChangeEvent] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ChangeEvent]
      rows.foreach { r =>
        if (r.tombstone) {
          if (hash.exists()) {
            out += ChangeEvent(key, "delete", hash.get())
            hash.clear()
          }
        } else {
          val h = Crc32Q.computeUtf8(r.token)
          if (!hash.exists() || hash.get() != h) {
            out += ChangeEvent(key, "create", h)
            hash.update(h)
          }
        }
      }
      out.iterator
    }
  }

  /** `transformWithState` form of [[changelog]] — same changelog semantics,
    * plus the piece the legacy API cannot express: **state TTL**. At
    * 100 TB-of-keys scale the hash map only grows under
    * `flatMapGroupsWithState` (a deleted key's entry is removed only by an
    * explicit tombstone; keys that silently stop arriving — dead crawl
    * URLs, retired entities — sit in the state store forever). With
    * `ttl = Some(d)`, a key untouched for `d` is evicted by the store
    * itself, bounding state to the working set. Semantics under eviction
    * stay safe: a re-arriving key re-emits `create` (at-least-once), which
    * the idempotent MERGE sink absorbs — same replay contract as
    * everything else in the engine; a tombstone for an evicted key emits
    * nothing (it was already forgotten). Requires the RocksDB state store
    * provider (Spark's `transformWithState` contract); TTL forces
    * processing-time mode, otherwise `TimeMode.None`. */
  def changelogTws(ds: Dataset[KeyedRecord],
      ttl: Option[java.time.Duration] = None): Dataset[ChangeEvent] = {
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val evEnc = Encoders.product[ChangeEvent]
    ds.groupByKey(_.external_id)(Encoders.STRING)
      .transformWithState(new ReconcileProcessor(cfg), mode,
        OutputMode.Append())
  }
}
