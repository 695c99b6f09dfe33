package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A keyed stream item for heavy-hitter tracking: `k` the tracking scope
  * (tenant, topic, shard), `item` the thing being counted, `t` event time
  * (drives the deterministic in-batch fold order). */
case class KeyedItem(k: String, item: String, t: Long)

/** A heavy-hitter estimate: `count` the space-saving counter (true
  * frequency ≤ count; overestimate bounded by `err`), emitted as a
  * per-micro-batch snapshot of the summary. */
case class HHEstimate(k: String, item: String, count: Long, err: Long)

/** Streaming heavy hitters by the SPACE-SAVING algorithm (Metwally,
  * Agrawal & El Abbadi 2005): per key, a bounded summary of `capacity`
  * (item → (count, err)) counters. A tracked item increments its counter;
  * an untracked item EVICTS the minimum-count entry m and inherits its
  * count (count = m.count + 1, err = m.count) — the published guarantees
  * follow: every item with true frequency > N/capacity is in the summary,
  * and each counter overestimates its item's true count by at most its
  * `err`.
  *
  * This is the streaming answer to "top items per key" where the exact
  * batch form (`vocab_topk` / `freq_approx`) needs the full count table:
  * state here is EXACTLY `capacity` counters per key no matter how long
  * the stream runs or how many distinct items pass — the bounded-state
  * discipline of [[StatefulRateLimit]] applied to frequency estimation.
  * Within a micro-batch the group's buffer folds in (t, item) order so
  * replays are deterministic; output (Update mode) is the post-batch
  * summary snapshot, newest wins downstream. */
object StatefulHeavyHitters {

  private def transition(capacity: Int)(key: String,
      events: Iterator[KeyedItem],
      state: GroupState[Map[String, (Long, Long)]]): Iterator[HHEstimate] = {
    var s = if (state.exists) state.get else Map.empty[String, (Long, Long)]
    events.toArray.sortBy(e => (e.t, e.item)).foreach { e =>
      s.get(e.item) match {
        case Some((c, err)) => s = s.updated(e.item, (c + 1, err))
        case None if s.size < capacity =>
          s = s.updated(e.item, (1L, 0L))
        case None =>
          // evict the minimum counter (ties to the lexicographically
          // smallest item so replays agree); the newcomer inherits its
          // count as the overestimate bound
          val (mItem, (mCount, _)) = s.minBy { case (it, (c, _)) => (c, it) }
          s = (s - mItem).updated(e.item, (mCount + 1, mCount))
      }
    }
    state.update(s)
    s.iterator.map { case (item, (c, err)) => HHEstimate(key, item, c, err) }
  }

  def summarize(ds: Dataset[KeyedItem],
      capacity: Int): Dataset[HHEstimate] = {
    require(capacity >= 1, s"capacity=$capacity out of range")
    implicit val enc = Encoders.product[HHEstimate]
    implicit val stEnc =
      Encoders.kryo[Map[String, (Long, Long)]]
    ds.groupByKey(_.k)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(transition(capacity))
  }
}
