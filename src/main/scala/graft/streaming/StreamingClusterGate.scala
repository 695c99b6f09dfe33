package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.operators.Similarity.FrozenCentroids

/** Streaming twin of the cluster-balanced mixture
  * ([[graft.operators.Similarity.clusterMixture]]): every arriving row's
  * embedding is assigned to its nearest FROZEN centroid and kept iff the
  * deterministic Knuth id hash clears the cell's FROZEN keep rate.
  * Stateless per-row work against two broadcast-sized artifacts
  * (|cells| centroids + |cells| rates), the [[StreamingClassifierGate]]
  * posture: a production stream cannot re-derive the observed
  * distribution per batch, so the rates are trained once on the
  * reference corpus and frozen, exactly like the mixture twin's frozen
  * rate map.
  *
  * The whole gate is ONE column predicate — [[DotProduct]] per cell,
  * the batch stage's exact permille rounding
  * (`round(dot/(‖v‖·‖c‖)·1000).cast(long)`), the same
  * `(sim DESC, cid ASC)` argmax total order via an `array_max` over
  * per-cell structs, and the shared Knuth-ppm keep hash — so it runs
  * inside whole-stage codegen (pinned in PlanShapeSpec) instead of an
  * interpreted Row lambda deserializing every row.
  * [[graft.operators.Similarity.assignLocal]] remains ONLY as the
  * spec-side bit-parity witness of the assignment order.
  *
  * Parity contract (pinned in DedupSimilaritySpec): with rates frozen
  * from the same corpus the batch stage balances, the gate keeps the
  * identical row set. */
object StreamingClusterGate {

  /** Keep rows whose embedding's frozen-cell keep rate clears the id
    * hash; rows whose cell has no rate (a cell never seen at training
    * time) drop, matching the batch join's inner semantics
    * (`try_element_at` null, never the ANSI missing-key error). */
  def gate(df: DataFrame, vecCol: String, idCol: String,
      fc: FrozenCentroids, ratesPpm: Map[Long, Long]): DataFrame = {
    require(ratesPpm.values.forall(r => r >= 0 && r <= 1000000),
      s"ratesPpm must map into [0, 1e6]")
    val v = col(vecCol).cast("array<double>")
    val n2 = DotProduct(v, v)
    // one struct per frozen cell: (permille sim, -cid); array_max's
    // field-by-field order IS the batch argmax's (sim DESC, cid ASC)
    val cellStructs: Seq[Column] = fc.cells.map { case (cid, cv, cn2) =>
      struct(
        round(DotProduct(v, lit(cv)) / (sqrt(n2) * sqrt(lit(cn2)))
          * lit(1000.0)).cast("long").as("s"),
        lit(-cid).as("nc"))
    }
    val assignedCid = lit(0L) -
      array_max(array(cellStructs: _*)).getField("nc")
    val rateMap = map(ratesPpm.toSeq.sortBy(_._1)
      .flatMap { case (c, r) => Seq(lit(c), lit(r)) }: _*)
    val rate = try_element_at(rateMap, assignedCid)
    df.filter(rate.isNotNull &&
      graft.operators.TextAnalysis.keepHashPpm(col(idCol)) < rate)
  }
}
