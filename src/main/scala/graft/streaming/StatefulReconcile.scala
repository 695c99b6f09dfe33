package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Apply to a (streaming or batch) Dataset of [[KeyedRecord]]. */
  def changelog(ds: Dataset[KeyedRecord]): Dataset[ChangeEvent] = {
    implicit val evEnc = Encoders.product[ChangeEvent]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.external_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(transition)
  }
}
