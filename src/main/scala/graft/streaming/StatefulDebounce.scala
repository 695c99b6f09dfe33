package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A timed event keyed for debouncing: `k` is the debounce key (user ×
  * event type, device, …), `t` the event time in any monotone integer
  * unit, `event_id` the payload handle. */
case class TimedEvent(k: String, t: Long, event_id: Long)

/** Previous-SURVIVOR debounce — the stateful twin of the stateless
  * [[graft.operators.EventAnalytics.debounce]] (which measures gaps to
  * the previous ROW and deliberately stays one window pass).
  * Reference semantics: an event survives iff it is ≥ `minGap` after the
  * LAST SURVIVOR of its key; a long burst of sub-gap events therefore
  * keeps only its first event no matter how long it runs, which the
  * stateless form cannot express — the survivor chain is inherently
  * sequential per key, i.e. exactly a per-key streaming state machine.
  *
  * State is ONE long per key (last survivor's time): constant-size,
  * mergeable across micro-batches, and the fold order within a batch is
  * made deterministic by sorting each group's buffer on (t, event_id) —
  * micro-batch iterators carry no order guarantee.
  *
  * Scale: `groupByKey` hashes on the debounce key — the standard one
  * shuffle; state is 8 bytes/key in the state store. */
object StatefulDebounce {

  private def transition(minGap: Long)(key: String,
      events: Iterator[TimedEvent],
      state: GroupState[Long]): Iterator[TimedEvent] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[TimedEvent]
    var last = if (state.exists) Some(state.get) else None
    events.toArray.sortBy(e => (e.t, e.event_id)).foreach { e =>
      if (last.forall(l => e.t - l >= minGap)) {
        out += e
        last = Some(e.t)
      }
    }
    last.foreach(state.update)
    out.iterator
  }

  def survivors(ds: Dataset[TimedEvent], minGap: Long): Dataset[TimedEvent] = {
    implicit val enc = Encoders.product[TimedEvent]
    implicit val longEnc = Encoders.scalaLong
    ds.groupByKey(_.k)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(transition(minGap))
  }
}
