package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A bucketed event for rate limiting: `k` the limited key (user, API
  * token, device), `bucket` the time bucket (hour index, minute index —
  * any integer unit), `t` the event time inside the bucket, `event_id`
  * the payload handle. */
case class BucketedEvent(k: String, bucket: Long, t: Long, event_id: Long)

/** Streaming rate limiter — the stateful twin of the batch `rate_limit`
  * query (first `maxPerBucket` events per (key, bucket) under the
  * (t, event_id) total order). The batch form is one WindowGroupLimit
  * pass; streaming needs per-(key, bucket) admission state because the
  * first k events and everything after them can land in different
  * micro-batches.
  *
  * State is ONE (bucket, admitted-count) pair per key — admission counts
  * for PAST buckets are dropped the moment a newer bucket shows up
  * (buckets arrive roughly in order under any sane watermark), so state
  * does not grow with stream length. Within a micro-batch the group's
  * buffer sorts on (bucket, t, event_id) for a deterministic fold, same
  * discipline as [[StatefulDebounce]].
  *
  * Semantics note vs batch: admission is FIRST-ARRIVAL-WINS within what
  * the stream has seen — a late event that would have out-ranked an
  * admitted one in the batch order is rejected if the quota is already
  * spent (the inherent batch/stream divergence of any online limiter;
  * the parity spec feeds in-order data where the two agree exactly). */
object StatefulRateLimit {

  private def transition(maxPerBucket: Int)(key: String,
      events: Iterator[BucketedEvent],
      state: GroupState[(Long, Int)]): Iterator[BucketedEvent] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[BucketedEvent]
    var (curBucket, used) =
      if (state.exists) state.get else (Long.MinValue, 0)
    events.toArray.sortBy(e => (e.bucket, e.t, e.event_id)).foreach { e =>
      if (e.bucket > curBucket) { curBucket = e.bucket; used = 0 }
      if (e.bucket == curBucket && used < maxPerBucket) {
        out += e
        used += 1
      }
      // e.bucket < curBucket: a straggler behind the limiter's clock —
      // rejected (its quota window is already closed)
    }
    state.update((curBucket, used))
    out.iterator
  }

  def admitted(ds: Dataset[BucketedEvent],
      maxPerBucket: Int): Dataset[BucketedEvent] = {
    implicit val enc = Encoders.product[BucketedEvent]
    implicit val stEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    ds.groupByKey(_.k)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(transition(maxPerBucket))
  }
}
