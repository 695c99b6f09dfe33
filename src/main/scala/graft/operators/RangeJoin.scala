package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: points matched to the intervals that contain
  * them — `start <= pt <= end`, optionally per equi-key. The training-data
  * shapes: event → containing session/promo/incident window, timestamp →
  * validity interval, offset → document chunk span.
  *
  * Spark's built-in answer to a pure range predicate is a nested-loop or
  * cross join with a filter — quadratic, and the first thing that dies at
  * scale. This operator uses the standard bin-and-residual decomposition:
  *
  *  - each POINT hashes to exactly ONE fixed-width bin (`floor(pt/w)`);
  *  - each INTERVAL explodes into every bin it overlaps
  *    (`sequence(floor(start/w), floor(end/w))`);
  *  - the join is then a plain EQUI-join on (keys..., bin) — shuffled or
  *    broadcast by Catalyst like any other — with the exact
  *    `BETWEEN` kept as a residual filter.
  *
  * Correct by monotonicity: `floor(x/w)` in double is weakly monotone in
  * `x` (IEEE division rounding preserves order), so `start <= pt <= end`
  * implies `bin(start) <= bin(pt) <= bin(end)` — a containing interval
  * always lands in the point's bin. And because a point owns exactly one
  * bin, a pair can only meet once: no post-join dedup stage.
  *
  * Scale: candidate volume drops from |P|×|I| to Σ_bin |P_bin|×|I_bin|;
  * interval replication is `span/w + 1` rows. Pick `w` near the median
  * interval span — replication ≈2× while bins stay selective. Degenerate
  * long intervals (span ≫ w) are the skew to watch: cap them upstream or
  * raise `w`, exactly like `maxBucket` in the LSH family.
  */
object RangeJoin {

  /** Join `points` to the `intervals` containing them.
    *
    * @param ptCol    numeric point column on `points` (use a long domain —
    *                 e.g. epoch micros — for exact binning)
    * @param startCol/endCol  inclusive interval bounds on `intervals`,
    *                 same domain as `ptCol`
    * @param binWidth fixed bin width in that domain (> 0)
    * @param keys     equi-key columns present on BOTH sides (joined along
    *                 with the bin key); non-key column names must be
    *                 disjoint across the two inputs
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String, binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val p = points.withColumn("__bin", bin(col(ptCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(i, keys :+ "__bin",  "inner")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")
  }
}
