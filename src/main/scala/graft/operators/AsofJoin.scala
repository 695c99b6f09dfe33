package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with the same key
  * and `rightTs <= leftTs` (time-series point-in-time semantics — "the most
  * recent quote/state/error as of this event").
  *
  * Not in the reference (its only joins are single-key equality,
  * `internal/store/neo4j.go:90`), but a first-class need for event/feature
  * pipelines, so it ships as an engine extension.
  *
  * Scale shape: the naive formulation — equi-join on key, filter
  * `r.ts <= l.ts`, window-max per left row — materializes |L_k|×|R_k| rows
  * per key before the filter, quadratic in key cardinality skew. This
  * implementation instead UNIONS the two sides and takes one window pass:
  * tag rows, sort each key's timeline once, and carry the last-seen right
  * payload forward with `last(_, ignoreNulls)`. Cost is one shuffle + sort
  * of |L| + |R| rows on the key — linear, skew-bounded by the biggest
  * single key's timeline, the same shape Flink/KDB use for as-of.
  *
  * Within an equal (key, ts) the right row is ordered BEFORE the left row,
  * so a right update at exactly t is visible to a left row at t
  * (`>=` semantics, matching DuckDB/QuestDB ASOF JOIN). Ties among several
  * right rows at one (key, ts) are broken by `rightTieBreak` (ascending;
  * the LAST one wins) — pass an id column to make the winner deterministic.
  */
object AsofJoin {

  /** `left` and `right` must both contain `keyCol` and `tsCol`;
    * `payloadCols` are taken from `right` and appended (null when no right
    * row matches).
    *
    * `direction` — `"backward"` (default): latest right with
    * `rightTs <= leftTs`; `"forward"`: earliest right with
    * `rightTs >= leftTs` (equality visible in both). Forward is the same
    * single window pass over the DESCENDING timeline — still linear, no
    * join operator.
    *
    * `tolerance` — optional maximum distance between the left ts and the
    * matched right ts: a match further away resolves to null payloads,
    * exactly pandas `merge_asof(tolerance=...)`. Pass a literal comparable
    * to `leftTs - rightTs` (an INTERVAL for timestamp columns, a number
    * for numeric ones). Applied AFTER the window pass, per row — the plan
    * shape is unchanged. */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], rightTieBreak: Seq[String] = Nil,
      direction: String = "backward",
      tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asof direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // matched right ts rides along for the tolerance check
    val payload = struct(payloadCols.map(col) :+ col(tsCol).as("__mts"): _*)

    // side: right=0 sorts before left=1 at equal ts (equality visibility).
    val taggedL = left.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(right.select(payload).schema.fields.head.dataType)
          .as("__payload")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains).map(col) ++
        rightTieBreak.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__tb_$c"))): _*)
    // right rows with a NULL ts have no position on the timeline: the
    // nulls-first sort would otherwise make them an "-infinity" match for
    // every early left row, where ASOF semantics (and the SQL `>=`, which
    // is null-false) exclude them.
    val taggedR = right.filter(col(tsCol).isNotNull).select(
      (Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        payload.as("__payload")) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightTieBreak.map(c => col(c).as(s"__tb_$c"))): _*)

    // forward = the mirrored traversal: walk the timeline descending, so
    // "last right seen" is the NEAREST following right row
    val tsOrder = if (direction == "backward") col(tsCol).asc
      else col(tsCol).desc
    val order: Seq[Column] = tsOrder +: col("__side").asc +:
      rightTieBreak.map(c => col(s"__tb_$c").asc_nulls_first)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedL.unionByName(taggedR)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gated = tolerance match {
      case None => matched
      case Some(tol) =>
        val dist = if (direction == "backward")
          col(tsCol) - col("__asof.__mts")
        else col("__asof.__mts") - col(tsCol)
        matched.withColumn("__asof", when(dist <= tol, col("__asof")))
    }
    gated.select(leftCols.map(col) ++
      payloadCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
