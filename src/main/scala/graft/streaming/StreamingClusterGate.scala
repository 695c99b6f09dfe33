package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity
import graft.operators.Similarity.FrozenCentroids

/** Streaming twin of the cluster-balanced mixture
  * ([[Similarity.clusterMixture]]): every arriving row's embedding is
  * assigned to its nearest FROZEN centroid locally
  * ([[Similarity.assignLocal]] — bit-identical to the distributed
  * permille argmax) and kept iff the deterministic Knuth id hash clears
  * the cell's FROZEN keep rate. Stateless per-row work against two
  * broadcast artifacts (|cells| centroids + |cells| rates — both
  * model-sized), the [[StreamingClassifierGate]] posture: a production
  * stream cannot re-derive the observed distribution per batch, so the
  * rates are trained once on the reference corpus and frozen, exactly
  * like the mixture twin's frozen rate map.
  *
  * Parity contract (pinned in DedupSimilaritySpec): with rates frozen
  * from the same corpus the batch stage balances, the gate keeps the
  * identical row set. */
object StreamingClusterGate {

  /** The batch keep-hash, locally: `pmod(id * 2654435761, 1e6)` with
    * Java wrap-around multiply — bit-identical to the Spark column
    * expression. */
  private def knuthPpm(id: Long): Long = {
    val u = (id * 2654435761L) % 1000000L
    (u + 1000000L) % 1000000L
  }

  /** Keep rows whose embedding's frozen-cell keep rate clears the id
    * hash; rows whose cell has no rate (a cell never seen at training
    * time) drop, matching the batch join's inner semantics. */
  def gate(df: DataFrame, vecCol: String, idCol: String,
      fc: FrozenCentroids, ratesPpm: Map[Long, Long]): DataFrame = {
    require(ratesPpm.values.forall(r => r >= 0 && r <= 1000000),
      s"ratesPpm must map into [0, 1e6]")
    val vIdx = df.schema.fieldIndex(vecCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.filter { r =>
      val vec = r.getSeq[Double](vIdx).toArray
      ratesPpm.get(Similarity.assignLocal(vec, fc))
        .exists(rate => knuthPpm(r.getLong(iIdx)) < rate)
    }
  }
}
