package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** One LSH band-bucket row of a document: `bucket` is the band's
  * collision key (band index + banded xxhash64 of the MinHash signature
  * slice — the exact keys [[graft.operators.Dedup.minhashLshCandidates]]
  * self-joins on), `doc_id` the document carrying it. */
case class BandKeyed(bucket: String, doc_id: Long)

/** A streaming LSH candidate: `b` collided with the earlier-seen `a` in
  * band bucket `bucket` (ids canonicalized `a < b`; a pair may surface in
  * several buckets — downstream dedups, exactly as the batch form's
  * `.distinct()` does). */
case class LshCandidate(a: Long, b: Long, bucket: String)

/** Streaming MinHash-LSH near-dup candidates: the stateful twin of
  * [[graft.operators.Dedup.minhashLshCandidates]] for an unbounded
  * document stream. State lives per band BUCKET (not per document): a
  * `ListState[Long]` of the doc ids that have landed in the bucket so
  * far. A new document joins each of its k/r buckets once; every id
  * already resident is an LSH candidate pair, emitted immediately —
  * so the batch self-join on band keys becomes an O(bucket) state lookup
  * and candidates stream out with one micro-batch latency.
  *
  * Scale posture mirrors the batch tier:
  *  - `maxBucket` caps resident ids per bucket — the PROSPECTIVE form of
  *    the batch skew cap (first-come membership; later arrivals in a full
  *    bucket emit pairs against the residents but are not added). A
  *    degenerate boilerplate bucket therefore costs O(maxBucket) per
  *    arrival, never O(m²) per batch.
  *  - `ttl` evicts buckets untouched for the duration — near-dup
  *    detection against a sliding working set, the bounded-state
  *    discipline of [[StatefulReconcile.changelogTws]]. A re-arriving
  *    bucket restarts empty (at-least-once: a true near-dup pair whose
  *    members are separated by more than the TTL is consciously out of
  *    scope, same as any windowed dedup).
  *
  * Within a micro-batch a bucket's arrivals fold in ascending doc-id
  * order, so replays are deterministic. Requires the RocksDB state store
  * provider (Spark's `transformWithState` contract). */
object StatefulLshDedup {

  private class BucketProcessor(ttl: TTLConfig, maxBucket: Int)
      extends StatefulProcessor[String, BandKeyed, LshCandidate] {
    @transient private var members: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, ttl)

    override def handleInputRows(key: String, rows: Iterator[BandKeyed],
        timerValues: TimerValues): Iterator[LshCandidate] = {
      val resident = scala.collection.mutable.LinkedHashSet.empty[Long]
      members.get().foreach(resident += _)
      val out = scala.collection.mutable.ArrayBuffer.empty[LshCandidate]
      var appended = List.empty[Long]
      rows.toArray.map(_.doc_id).distinct.sorted.foreach { id =>
        if (!resident.contains(id)) {
          resident.foreach { e =>
            out += LshCandidate(math.min(e, id), math.max(e, id), key)
          }
          if (maxBucket <= 0 || resident.size < maxBucket) {
            resident += id
            appended ::= id
          }
        }
      }
      if (appended.nonEmpty) members.appendList(appended.reverse.toArray)
      out.iterator
    }
  }

  /** Band-keyed stream → candidate pair stream. `ttl = None` keeps
    * buckets forever (exact parity with the batch candidates over the
    * full history); a TTL bounds state to the working set and forces
    * processing-time mode. */
  def candidates(ds: Dataset[BandKeyed], maxBucket: Int = 0,
      ttl: Option[java.time.Duration] = None): Dataset[LshCandidate] = {
    val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
    val mode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    implicit val outEnc = Encoders.product[LshCandidate]
    ds.groupByKey(_.bucket)(Encoders.STRING)
      .transformWithState(new BucketProcessor(cfg, maxBucket), mode,
        OutputMode.Append())
  }
}
