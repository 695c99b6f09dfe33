package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product/telemetry event analytics: ordered funnels, cohort retention,
  * and time-window debouncing. The reference syncs event-shaped API payloads
  * (SURVEY §1.1) but never analyzes them; these are the standard analyses a
  * warehouse user runs on that data, built on the same events fixture as
  * `sessionize`/`stream_window`.
  */
object EventAnalytics {

  /** Ordered funnel: for each entity, stage k's timestamp is the EARLIEST
    * event of `stages(k)` strictly after that entity's stage-(k-1)
    * timestamp (the classic "did view → click → purchase happen in order"
    * question — min-over-threshold per stage, not sequence matching).
    * Returns one row per entity that reached stage 1: `t_1..t_n` (null
    * once the funnel is abandoned) and `stage` = count reached.
    *
    * Scale shape: each stage is a filtered partial-combined min-aggregate
    * hash-joined back on the entity key, so every exchange in the chain
    * partitions on the SAME key (co-partitioned on a cluster, and the
    * stage frames shrink monotonically — later joins see only survivors).
    * Never a sort, never a sequence scan over whole event histories. */
  def funnelStages(events: DataFrame, entityCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val head = events.filter(col(typeCol) === stages.head)
      .groupBy(col(entityCol)).agg(min(col(tsCol)).as("t_1"))
    val withAll = stages.zipWithIndex.tail.foldLeft(head) {
      case (acc, (st, i)) =>
        val prev = s"t_$i"
        val cur = s"t_${i + 1}"
        val next = events.filter(col(typeCol) === st)
          .join(acc.select(col(entityCol), col(prev)), entityCol)
          .filter(col(tsCol) > col(prev))
          .groupBy(col(entityCol)).agg(min(col(tsCol)).as(cur))
        acc.join(next, Seq(entityCol), "left")
    }
    val stageExpr = stages.indices.map(i =>
      when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    withAll.withColumn("stage", stageExpr)
  }

  /** Cohort retention grid: cohort = each entity's first active day;
    * output = distinct entities per (cohort, age_days) cell — the
    * "how many of the day-X signups were still here k days later" table.
    * Two aggregates, both hashed on the entity key then the (small)
    * cohort grid; the second countDistinct is exact (swap in the HLL tier
    * at extreme cardinality — same plan). */
  def retentionCohorts(events: DataFrame, entityCol: String,
      dayCol: String): DataFrame = {
    val first = events.groupBy(col(entityCol))
      .agg(min(col(dayCol)).as("cohort"))
    events.join(first, entityCol)
      .groupBy(col("cohort"), (col(dayCol) - col("cohort")).as("age_days"))
      .agg(countDistinct(col(entityCol)).as("n_users"))
  }

  /** First-order transition matrix (Markov chain over event types): for
    * each entity's event sequence under the `orderCols` total order, count
    * (previous type → type) transitions, with each row's share of its
    * source type in integer permille (floor division — exact on any
    * engine). The workhorse behind "what do users do after X" and
    * next-event priors.
    *
    * Scale shape: one window pass hashed on the entity key (the only
    * data-sized shuffle), then the transition counts collapse to the
    * |types|² grid before the share window runs — the second window sees
    * a constant-size frame no matter the event count. */
  def transitionMatrix(events: DataFrame, entityCol: String,
      typeCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(orderCols: _*)
    val counts = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_et"), col(typeCol).as("et"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn("permille",
      expr("n * 1000 DIV sum(n) OVER (PARTITION BY prev_et)"))
  }

  /** Time-weighted average (TWAP): per entity, the average of `valueCol`
    * weighted by how long each value was "current" — the span to the next
    * event under the (tsCol, orderCols) total order. The last event of an
    * entity has no span and drops out (standard TWAP-to-last-observation).
    * Value cents × span micros stays under 2^63 for month-scale spans, so
    * the division `Σ(v·dt) / Σ(dt)` is exact BIGINT floor math on any
    * engine — no float accumulator.
    *
    * Scale shape: the lead() window and the final aggregate both hash on
    * the entity key — one data-sized exchange, reused by the aggregate. */
  def timeWeightedAvg(events: DataFrame, entityCol: String, tsCol: String,
      valueCol: String, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy((col(tsCol) +: orderCols): _*)
    events
      .withColumn("__dt", lead(col(tsCol), 1).over(w) - col(tsCol))
      .filter(col("__dt").isNotNull)
      .groupBy(col(entityCol))
      .agg(expr(s"sum($valueCol * __dt) DIV sum(__dt)").as("twap"),
        count(lit(1)).as("n_spans"))
  }

  /** Sweep-line maximum concurrency: given [start, end) intervals, the
    * peak number simultaneously open, per key. Each interval contributes a
    * +1 at start and a −1 at end; ordering ties as (t, delta) processes
    * closes before opens at the same instant, so back-to-back intervals
    * ([a,t) then [t,b)) never double-count — the half-open semantics.
    * The running sum's maximum is tie-order independent beyond that:
    * permuting equal (t, delta) rows permutes identical deltas, leaving
    * every prefix value unchanged.
    *
    * Scale shape: the sweep is per-key (one shuffle on the key; each
    * key's 2n points sort independently). A single global sweep line is
    * the range-partition + two-pass prefix-sum shape instead — see
    * [[Transforms.orderedPrefixSum]]. */
  def maxConcurrency(intervals: DataFrame, keyCol: String,
      startCol: String, endCol: String): DataFrame = {
    val opens = intervals.select(col(keyCol).as("k"),
      col(startCol).as("t"), lit(1L).as("d"))
    val closes = intervals.select(col(keyCol).as("k"),
      col(endCol).as("t"), lit(-1L).as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    opens.union(closes)
      .withColumn("__c", sum(col("d")).over(w))
      .groupBy(col("k"))
      .agg(max(col("__c")).as("max_concurrent"))
  }

  /** OHLC downsampling bars: per (key, time bucket), the open (first),
    * high, low, and close (last) of `valueCol`, plus the row count — the
    * classic tick→bar resampling every telemetry/market pipeline runs.
    * First/last are `min_by`/`max_by` under a caller-supplied TOTAL order
    * (`orderCols`, e.g. (ts, event_id)) so ties can't make the bar
    * engine- or partitioning-dependent.
    *
    * Scale shape: ONE partial-combined hash aggregate — min_by/max_by
    * partials are a single (order-key, value) pair each, so executors
    * collapse to |keys×buckets| rows before the only shuffle. */
  def ohlcBars(events: DataFrame, keyCol: String, bucketCol: Column,
      valueCol: String, orderCols: Seq[Column]): DataFrame = {
    val ord = struct(orderCols: _*)
    events
      .groupBy(col(keyCol), bucketCol) // caller aliases the bucket column
      .agg(min_by(col(valueCol), ord).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ord).as("close"),
        count(lit(1)).as("n"))
  }

  /** Exact sliding-window distinct count: per (key, window ending at
    * bucket W), the number of distinct entities seen in buckets
    * [W − lookback, W], anchored at buckets where the key actually has
    * data. The bounded explode turns the trailing-range predicate into an
    * equi-join — the same bin trick as [[graft.operators.RangeJoin]] —
    * so the plan is hash joins + hash aggregates end to end; the oracle
    * states the same thing as a BETWEEN range join.
    *
    * Scale: rows collapse to distinct (key, bucket, entity) FIRST (one
    * partial-combined aggregate), each survivor then fans out to only
    * `lookback + 1` window keys, and the final exact distinct is the
    * standard two-phase expand. No window function, no range join, no
    * per-window rescan. */
  def slidingDistinct(df: DataFrame, keyCol: String, bucketCol: String,
      entityCol: String, lookback: Int): DataFrame = {
    require(lookback >= 0, s"lookback=$lookback")
    val e = df.select(col(keyCol), col(bucketCol), col(entityCol)).distinct()
    val anchors = e.select(col(keyCol), col(bucketCol).as("win_end"))
      .distinct()
    val contrib = e.select(col(keyCol),
      explode(sequence(col(bucketCol),
        col(bucketCol) + lit(lookback.toLong))).as("win_end"),
      col(entityCol))
    contrib.join(anchors, Seq(keyCol, "win_end"))
      .groupBy(col(keyCol), col("win_end"))
      .agg(count_distinct(col(entityCol)).as("n_distinct"))
  }

  /** Shannon entropy of a categorical distribution per key, in integer
    * permille-nats: H = −Σ p·ln(p) over the key's category shares — the
    * behavioral-diversity / corpus-mix scorer (a user who only ever fires
    * one event type scores 0). Same integer-log discipline as
    * [[TextAnalysis.unigramLogProb]]: each ln(c/n) is quantized to
    * micro-nats (BIGINT) BEFORE the weighted sum, so accumulation order
    * can't move the result — the only float op is the per-category ln,
    * identical one-ulp territory on any libm.
    *
    * Scale shape: (key, cat) counts collapse first (partial-combined);
    * the category→key window and the final aggregate both hash on the
    * key, so the second exchange is reused by the aggregate. */
  def distributionEntropy(df: DataFrame, keyCol: String,
      catCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
    val wk = Window.partitionBy(col(keyCol))
    counts
      .withColumn("__n", sum(col("__c")).over(wk))
      .withColumn("__lp",
        expr("CAST(round(ln(CAST(__c AS DOUBLE) / CAST(__n AS DOUBLE)) " +
          "* 1000000, 0) AS BIGINT)"))
      .groupBy(col(keyCol))
      .agg(expr("CAST(round(-SUM(__lp * __c) / (MAX(__n) * 1000.0), 0) " +
          "AS BIGINT)").as("entropy_permille"),
        count(lit(1)).as("n_cats"))
  }

  /** Seasonal-baseline anomaly census: bucket counts per (key, period,
    * phase) — e.g. (event type, day, hour-of-day) — are compared to the
    * key's mean count FOR THAT PHASE across periods; a bucket is
    * anomalous when `count · n_periods > factor · total` (integer
    * cross-multiplied form of `count > factor × mean`, exact — no float
    * mean anywhere). Returns the per-(key, phase) report: periods seen,
    * total events, anomalous periods. This is the hourly-seasonality
    * monitor that flags a traffic spike against the same-hour baseline
    * instead of the global mean.
    *
    * Scale shape: raw events collapse to (key, period, phase) counts in
    * one partial-combined aggregate; the phase stats are |key×phase|
    * rows, broadcast back for the flag test (same posture as
    * [[Transforms.winsorizedSum]]); the final census aggregates the
    * already-collapsed buckets. */
  def seasonalAnomaly(df: DataFrame, keyCol: String, periodCol: Column,
      phaseCol: Column, factor: Int): DataFrame = {
    val buckets = df.groupBy(col(keyCol), periodCol.as("__period"),
        phaseCol.as("__phase"))
      .agg(count(lit(1)).as("__c"))
    val stats = buckets.groupBy(col(keyCol), col("__phase"))
      .agg(count(lit(1)).as("__np"), sum(col("__c")).as("__tot"))
    buckets.join(broadcast(stats), Seq(keyCol, "__phase"))
      .groupBy(col(keyCol), col("__phase").as("phase"))
      .agg(max(col("__np")).as("n_periods"),
        max(col("__tot")).as("total_events"),
        sum(when(col("__c") * col("__np") > lit(factor.toLong) * col("__tot"),
          1L).otherwise(0L)).as("n_anomalous"))
  }

  /** Mutual information between two categorical columns, in integer
    * permille-nats: I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) — the
    * dependence scorer behind feature selection and drift detection
    * (is event mix independent of hour-of-day?). Same quantized-ln
    * discipline as [[distributionEntropy]]: each cell's log-ratio is
    * quantized to micro-nats BEFORE the weighted sum, so the one number
    * this returns is bit-stable under any partitioning.
    *
    * Scale: the only data-sized stage is the (x, y) cell aggregate;
    * marginals RE-aggregate from the cells (counts only, never rows) and
    * come back broadcast — no single-partition window anywhere. Returns
    * one row: (mi_permille, n_cells, n_events). */
  def mutualInformation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    val mx = cells.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
    val my = cells.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
    val n = cells.agg(sum(col("__c")).as("__n"))
    cells.join(broadcast(mx), "__x")
      .join(broadcast(my), "__y")
      .crossJoin(broadcast(n))
      .withColumn("__q", expr(
        "CAST(round(ln((CAST(__c AS DOUBLE) * CAST(__n AS DOUBLE)) / " +
          "(CAST(__cx AS DOUBLE) * CAST(__cy AS DOUBLE))) * 1000000, 0) " +
          "AS BIGINT)"))
      .agg(expr("CAST(round(SUM(__q * __c) / (MAX(__n) * 1000.0), 0) " +
          "AS BIGINT)").as("mi_permille"),
        count(lit(1)).as("n_cells"),
        max(col("__n")).as("n_events"))
  }

  /** Pearson chi-square independence statistic over the x × y
    * contingency COMPLETE grid — the [[mutualInformation]] companion
    * ("are these categoricals dependent" with a significance scale).
    * Critical difference from MI: zero-count cells CONTRIBUTE (o=0 still
    * costs e), so the grid is the marginals' cross join, never just the
    * observed cells. Per-cell contribution uses the cross-multiplied
    * exact form (o·n − cx·cy)² / (cx·cy·n) — numerator exact in
    * DECIMAL(38,0), one double division per cell quantized to micros,
    * integer-summed (the MI quantization posture). Returns chi2 in
    * millis + degrees of freedom.
    *
    * Scale shape: one data-sized aggregate to cells; marginals
    * re-aggregate from cells and come back broadcast; the grid is
    * |x|·|y| rows (a cross of two broadcast frames). */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("__x"), col(yCol).as("__y"))
      .agg(count(lit(1)).as("__c"))
    val mx = cells.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
    val my = cells.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
    val n = cells.agg(sum(col("__c")).as("__n"))
    broadcast(mx).crossJoin(broadcast(my))
      .join(cells, Seq("__x", "__y"), "left")
      .withColumn("__o", coalesce(col("__c"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("__q", expr(
        "CAST(round(CAST((CAST(__o AS DECIMAL(38,0)) * __n " +
          "- CAST(__cx AS DECIMAL(38,0)) * __cy) " +
          "* (CAST(__o AS DECIMAL(38,0)) * __n " +
          "- CAST(__cx AS DECIMAL(38,0)) * __cy) AS DOUBLE) * 1000000 / " +
          "(CAST(__cx AS DOUBLE) * CAST(__cy AS DOUBLE) " +
          "* CAST(__n AS DOUBLE)), 0) AS BIGINT)"))
      .agg(expr("SUM(__q) DIV 1000").as("chi2_milli"),
        expr("(COUNT(DISTINCT __x) - 1) * (COUNT(DISTINCT __y) - 1)")
          .as("dof"),
        count(lit(1)).as("n_cells"))
  }

  /** Per-key OLS trend slope from exact integer sufficient statistics:
    * slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), with x recentered to the
    * key's minimum so the sums stay in BIGINT range and the cross
    * products in DECIMAL(38,0) — the metric-drift detector ("is this
    * event type's value trending?"). Only the FINAL division touches
    * doubles, with num/den exact integers on any engine, so the permille
    * result is reproducible under any partitioning. Keys with a
    * degenerate x spread (den = 0) report null slope.
    *
    * Scale: one pass for the per-key minimum (tiny, broadcast back), one
    * partial-combined aggregate for the five sufficient statistics. */
  def trendSlope(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val mins = df.groupBy(col(keyCol)).agg(min(col(xCol)).as("__x0"))
    df.join(broadcast(mins), keyCol)
      // DECIMAL(38,0) sums: x² per row fits a long, but a key's Σx² can
      // pass 2^63 (a year of seconds squared × row count) and Spark's
      // non-ANSI long sum would wrap SILENTLY — decimal keeps every
      // statistic exact at any scale (DuckDB's SUM widens to HUGEINT on
      // its own).
      .withColumn("__x", (col(xCol) - col("__x0")).cast("decimal(38,0)"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("__sx"),
        sum(col(yCol)).as("__sy"),
        sum(col("__x") * col(yCol)).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .withColumn("__num",
        expr("CAST(n AS DECIMAL(38,0)) * __sxy - __sx * __sy"))
      .withColumn("__den",
        expr("CAST(n AS DECIMAL(38,0)) * __sxx - __sx * __sx"))
      .select(col(keyCol), col("n"),
        expr("CASE WHEN __den = 0 THEN NULL ELSE " +
          "CAST(round(CAST(__num AS DOUBLE) * 1000000 / " +
          "CAST(__den AS DOUBLE), 0) AS BIGINT) END").as("slope_micro"))
  }

  /** Out-of-orderness census — the watermark-tuning report for a stream:
    * per key, how many events arrive with an event time older than the
    * running maximum seen so far (in arrival order), and the worst
    * lateness. `arrivalCols` must be a total order (ingest sequence,
    * file+offset, event id). One window pass per key; lateness is exact
    * integer time units. This is what you run BEFORE choosing a
    * `withWatermark` delay. */
  def disorderCensus(df: DataFrame, keyCol: String, tsCol: String,
      arrivalCols: Seq[Column], lateThreshold: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(arrivalCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__hwm", max(col(tsCol)).over(w))
      .withColumn("__late",
        when(col("__hwm").isNotNull && col(tsCol) < col("__hwm"),
          col("__hwm") - col(tsCol)).otherwise(lit(0L)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > 0, 1L).otherwise(0L)).as("n_out_of_order"),
        sum(when(col("__late") > lateThreshold, 1L).otherwise(0L))
          .as("n_beyond_threshold"),
        max(col("__late")).as("max_lateness"))
  }

  /** Debounce: drop events closer than `minGap` (in `tsCol` units) to the
    * PREVIOUS event of the same key — duplicate-click / retry suppression.
    * One window pass = one shuffle on the key; `orderCols` must be a total
    * order (include an id tiebreaker) for a deterministic survivor set.
    * Note the reference point is the previous ROW, not the previous
    * SURVIVOR — a burst longer than `minGap` keeps its first event and
    * any event ≥ `minGap` after its predecessor (the stateless form; the
    * previous-survivor form is inherently sequential per key and lives in
    * streaming state, cf. [[graft.streaming.StatefulReconcile]]). */
  def debounce(events: DataFrame, keyCols: Seq[Column],
      orderCols: Seq[Column], tsCol: String, minGap: Long): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols: _*)
    events.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull || col(tsCol) - col("__prev") >= minGap)
      .drop("__prev")
  }

  /** Interval union-merge (gaps-and-islands over REAL [start, end)
    * intervals, not point events — cf. [[graft.operators.Sessionize]] for
    * the point form): per key, coalesce every overlapping-or-touching
    * interval chain into one island and report the census — island count,
    * total covered span (the measure of the union), and the longest
    * island. This is uptime/coverage math: nested and staggered intervals
    * collapse correctly because an island breaks only where a start
    * strictly clears the running maximum of ALL previous ends, not just
    * the previous row's end.
    *
    * Half-open semantics: [a,b) then [b,c) touch → one island (contiguous
    * coverage, zero gap).
    *
    * Determinism: rows order by (start, end, orderCols); the prefix-max
    * of ends is insensitive to tie order among equal (start, end) rows
    * (they contribute identical ends), so the island ids — and everything
    * derived — are partition-order independent.
    *
    * Scale shape: one window pass hashed on the key (the only data-sized
    * shuffle — islands then collapse in a partial-combined aggregate that
    * reuses the same hash partitioning). A single global sweep would be
    * the range-partition prefix-sum shape instead
    * ([[Transforms.orderedPrefixSum]]). */
  def mergeIntervals(intervals: DataFrame, keyCol: String, startCol: String,
      endCol: String, orderCols: Seq[Column]): DataFrame = {
    val ord = (col(startCol) +: col(endCol) +: orderCols)
    val wPrev = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    intervals
      .withColumn("__hwm", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__hwm").isNull || col(startCol) > col("__hwm"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(wRun))
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as("__s"), max(col(endCol)).as("__e"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("__e") - col("__s")).as("covered"),
        max(col("__e") - col("__s")).as("longest"))
  }

  /** Cumulative audience growth: per active day, the distinct actives,
    * the first-time entities (new users), and the running total of
    * everyone ever seen — the growth-accounting triple (new vs returning
    * vs cumulative) behind every "users over time" chart. The cumulative
    * count needs NO giant distinct-over-window: each entity contributes
    * once at its first-seen day, so the running total is a prefix sum of
    * per-day new-user counts.
    *
    * Scale shape: (key, day) pairs collapse map-side; first-seen is one
    * hash aggregate on the entity key; everything after runs on
    * |days|-row frames (the only window is over that tiny frame). */
  def cumulativeUsers(events: DataFrame, keyCol: String,
      dayCol: Column): DataFrame = {
    val d = events.select(col(keyCol).as("__k"), dayCol.as("day")).distinct()
    val firstSeen = d.groupBy(col("__k")).agg(min(col("day")).as("__fday"))
    val newbies = firstSeen.groupBy(col("__fday").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val actives = d.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    actives.join(newbies, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users", sum(col("n_new")).over(w))
  }

  /** Top-k behavioral path trigrams: the most common length-3 event-type
    * sequences across per-entity timelines — the sequence-mining census
    * ("view→click→purchase beats view→view→bounce?") that next-action
    * models and UX funnels start from. Each entity's timeline sorts
    * ARRAY-SIDE under the (orderCols, type) total order (`array_sort`
    * makes the `collect_list` partition-order immune), trigrams build via
    * two fused `zip_with` passes — no positional self-join, no per-event
    * window — and only (trigram, partial count) pairs shuffle into the
    * final `TakeOrderedAndProject` top-k (count desc, trigram asc).
    *
    * Bounded-timeline contract: per-entity event counts must fit an
    * executor row (same contract as `group_state`/`pack_sequences`); the
    * window-lead formulation trades that bound for a per-event sort. */
  def pathTrigrams(events: DataFrame, keyCol: String, typeCol: String,
      orderCols: Seq[Column], k: Int): DataFrame = {
    val arr = array_sort(collect_list(struct(orderCols :+ col(typeCol): _*)))
    val types = transform(col("__arr"), x => x.getField(typeCol))
    val n2 = greatest(size(col("__types")) - 2, lit(0))
    events.groupBy(col(keyCol)).agg(arr.as("__arr"))
      .withColumn("__types", types)
      .withColumn("__tri", zip_with(
        zip_with(slice(col("__types"), lit(1), n2),
          slice(col("__types"), lit(2), n2),
          (a, b) => concat(a, lit(" "), b)),
        slice(col("__types"), lit(3), n2),
        (ab, c) => concat(ab, lit(" "), c)))
      .select(explode(col("__tri")).as("trigram"))
      .groupBy(col("trigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("trigram").asc)
      .limit(k)
  }

  /** Bit-packed presence bitmap: per (key, bucket of `bucketDays` days),
    * a single BIGINT whose bit i records activity on day i of the bucket,
    * plus the popcount = exact active-day count. 60 days of per-day
    * presence collapse into 8 bytes — the layout trick behind fast
    * "active N of last M days" segmentation at billions of users: one
    * `bit_or` aggregate builds it, `bit_count` and mask tests answer
    * every downstream question without re-touching events. Bits stay in
    * 0..59, so the mask never reaches the sign bit (engine-portable).
    *
    * Scale shape: ONE partial-combined aggregate — bit_or partials are a
    * single long per (key, bucket), so executors collapse before the only
    * shuffle; no distinct, no window. */
  def activityBitmap(events: DataFrame, keyCol: String, dayCol: Column,
      bucketDays: Int = 60): DataFrame = {
    require(bucketDays >= 1 && bucketDays <= 63,
      s"bucketDays=$bucketDays must fit a BIGINT below the sign bit")
    events.select(col(keyCol), dayCol.as("__day"))
      .select(col(keyCol), expr(s"__day DIV $bucketDays").as("bucket"),
        expr(s"shiftleft(1L, CAST(__day % $bucketDays AS INT))").as("__bit"))
      .groupBy(col(keyCol), col("bucket"))
      .agg(expr("bit_or(__bit)").as("mask"))
      .withColumn("n_active", expr("CAST(bit_count(mask) AS BIGINT)"))
  }

  /** Consecutive-day streak census: per key, the number of distinct
    * active days and the longest run of consecutive days — the
    * "7-day streak" engagement feature. Classic rank-difference islands:
    * over the per-key DISTINCT day list, `day − row_number()` is constant
    * exactly within a consecutive run, so one window pass + two
    * aggregates finish the job. (Contrast [[mergeIntervals]], which
    * islands REAL intervals via prefix-max — points on an integer grid
    * don't need it.)
    *
    * Scale shape: the distinct collapses (key, day) pairs map-side; the
    * window and both aggregates all hash on the key — one data-sized
    * shuffle of (key, day) pairs only. */
  def streakCensus(events: DataFrame, keyCol: String,
      dayCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__day"))
    events.select(col(keyCol), dayCol.as("__day")).distinct()
      .withColumn("__isl", col("__day") - row_number().over(w))
      .groupBy(col(keyCol), col("__isl"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(keyCol))
      .agg(sum(col("__len")).as("n_days"),
        max(col("__len")).as("longest_streak"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic, exact integers: for
    * each group g, the maximum CDF gap between g's value distribution and
    * the pooled REST, as D·10⁶ via cross-multiplication —
    *
    *   D_micro = max over v of |cum_g(v)·n_rest − cum_rest(v)·n_g|
    *             · 1000000 DIV (n_g·n_rest)
    *
    * — no float CDFs, so the result is bit-identical on any engine. This
    * is the train/serve-skew alarm: "does event type X's value
    * distribution still look like everything else's".
    *
    * Scale shape: raw rows collapse to (group, value) counts FIRST (one
    * partial-combined aggregate — the only data-sized shuffle); the CDF
    * grid is |groups| × |distinct values| (an explicit cross of two
    * already-small frames), and the prefix/max windows run per group on
    * that grid, never on raw rows. */
  def ksDrift(events: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val counts = events.groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("__c")).localCheckpoint()
    val values = counts.select(col(valCol)).distinct()
    val groups = counts.groupBy(col(groupCol)).agg(sum(col("__c")).as("__ng"))
    val total = counts.agg(sum(col("__c")).as("__n")).select(col("__n"))
    val grid = groups.crossJoin(broadcast(total)).crossJoin(values)
      .join(counts, Seq(groupCol, valCol), "left")
      .withColumn("__cg", coalesce(col("__c"), lit(0L)))
    val perV = counts.groupBy(col(valCol)).agg(sum(col("__c")).as("__cv"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(perV), valCol)
      .withColumn("__cumg", sum(col("__cg")).over(w))
      .withColumn("__cumr", sum(col("__cv") - col("__cg")).over(w))
      .groupBy(col(groupCol))
      .agg(max(col("__ng")).as("n_g"),
        max(col("__n") - col("__ng")).as("n_rest"),
        max(abs(col("__cumg") * (col("__n") - col("__ng"))
          - col("__cumr") * col("__ng"))).as("__dmax"))
      .select(col(groupCol), col("n_g"), col("n_rest"),
        expr("__dmax * 1000000 DIV (n_g * n_rest)").as("d_micro"))
  }

  /** Lag-1 autocorrelation (serial correlation) per key — the "is this
    * metric momentum or noise" scorer behind seasonality/trend triage.
    * Pairs (vₜ₋₁, vₜ) form under the caller's total order; the Pearson
    * correlation over those pairs is computed from exact integer
    * sufficient stats (n, Σx, Σy, Σxy, Σx², Σy² in DECIMAL(38,0) — no
    * float accumulation, so partial aggregation order can't perturb it),
    * with ONE double expression at the end quantizing to integer micros.
    * Same discipline as [[trendSlope]].
    *
    * Scale shape: one lag() window pass hashed on the key (the only
    * data-sized shuffle), then a partial-combined aggregate over the
    * pairs on the same key. */
  def lagAutocorr(events: DataFrame, keyCol: String, valCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val dec = "DECIMAL(38,0)"
    events
      .withColumn("__x", lag(col(valCol), 1).over(w))
      .filter(col("__x").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col(valCol).cast(dec)).as("__sy"),
        sum((col("__x") * col(valCol)).cast(dec)).as("__sxy"),
        sum((col("__x") * col("__x")).cast(dec)).as("__sxx"),
        sum((col(valCol) * col(valCol)).cast(dec)).as("__syy"))
      .withColumn("__num",
        expr("CAST(n_pairs AS DECIMAL(38,0)) * __sxy - __sx * __sy"))
      .withColumn("__dx",
        expr("CAST(n_pairs AS DECIMAL(38,0)) * __sxx - __sx * __sx"))
      .withColumn("__dy",
        expr("CAST(n_pairs AS DECIMAL(38,0)) * __syy - __sy * __sy"))
      .select(col(keyCol), col("n_pairs"),
        expr("CASE WHEN __dx = 0 OR __dy = 0 THEN NULL ELSE " +
          "CAST(round(CAST(__num AS DOUBLE) * 1000000 / " +
          "(sqrt(CAST(__dx AS DOUBLE)) * sqrt(CAST(__dy AS DOUBLE))), 0) " +
          "AS BIGINT) END").as("corr_micro"))
  }

  /** Dyadic-decay EWMA over a per-(key, day) series, integers end to end:
    * each daily total contributes weight 2^(H−age) for age = days back
    * (half-life = one day, window cut at H days — weights below 2⁰ are
    * exactly the terms a float EWMA loses to ulp anyway), and the smoothed
    * value is the weighted sum floor-divided by the realized weight sum.
    * Powers of two + floor division keep every intermediate an exact
    * integer, so any engine and any execution order agrees bit-for-bit —
    * the recursive αx+(1−α)s form is order-dependent float and oracle-
    * hostile, while this windowed form is its exact truncation.
    *
    * Scale shape: raw events collapse FIRST to the (key, day) grid (one
    * partial-combined aggregate — the only data-sized shuffle); the decay
    * is a banded self-join of that grid on the key with `0 ≤ age ≤ H`,
    * which is |grid|·H work on a |keys|×|days| frame, independent of the
    * raw event count. Never a window over raw rows, no gap-filling needed
    * (missing days simply contribute no term, exactly like the gapped
    * recursive form). */
  def ewmaDaily(events: DataFrame, keyCol: String, dayCol: Column,
      valCents: Column, horizon: Int = 30): DataFrame = {
    val daily = events.select(col(keyCol).as("__k"), dayCol.as("day"),
        valCents.as("__c"))
      .groupBy(col("__k"), col("day")).agg(sum(col("__c")).as("cents"))
      .localCheckpoint()
    val past = daily.select(col("__k").as("__k2"), col("day").as("__d2"),
      col("cents").as("__c2"))
    daily.join(past,
        col("__k") === col("__k2") &&
          col("__d2").between(col("day") - horizon, col("day")))
      .withColumn("__w", expr(
        s"shiftleft(CAST(1 AS BIGINT), CAST($horizon - (day - __d2) AS INT))"))
      .groupBy(col("__k"), col("day"))
      .agg(max(when(col("__d2") === col("day"), col("cents"))).as("cents"),
        count(lit(1)).as("n_window"),
        sum(col("__w") * col("__c2")).as("__swx"),
        sum(col("__w")).as("__sw"))
      .withColumn("ewma_cents", expr("__swx DIV __sw"))
      .select(col("__k").as(keyCol), col("day"), col("cents"),
        col("n_window"), col("ewma_cents"))
  }

  /** CUSUM level-shift detector (Page 1954), exact integers: per key, the
    * deviation of each daily total from the key's own mean accumulates,
    * and the classic recursion S_n = max(0, S_{n−1} + dev_n) is computed
    * NON-recursively as `cumsum − running min(cumsum)` (and the downward
    * side as `running max − cumsum`) — the textbook prefix identity that
    * turns an inherently sequential scan into two windows any engine
    * executes identically on integers. Returns one row per key: the peak
    * upward and downward excursions and the (earliest) day each peaked —
    * "where did this metric's level actually break".
    *
    * The reference mean is the key's floor-average daily total
    * (integer-division; exactness over unbiasedness, same posture as
    * [[pageRank]]). Scale shape: events collapse to the (key, day) grid
    * first; the mean attaches via one window over the key partition of
    * that GRID (≤ |days| rows per key), the prefix windows run on the
    * same partition, and the argmax rows reduce via row_number + a
    * conditional aggregate — raw rows are touched exactly once. */
  def cusumShift(events: DataFrame, keyCol: String, dayCol: Column,
      valCents: Column): DataFrame = {
    val daily = events.select(col(keyCol).as("__k"), dayCol.as("day"),
        valCents.as("__c"))
      .groupBy(col("__k"), col("day")).agg(sum(col("__c")).as("cents"))
    val wk = Window.partitionBy(col("__k"))
    val wc = wk.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("__mean", expr(
        "sum(cents) OVER (PARTITION BY __k) DIV count(1) OVER (PARTITION BY __k)"))
      .withColumn("__cum", sum(col("cents") - col("__mean")).over(wc))
      .withColumn("s_pos", col("__cum") - min(col("__cum")).over(wc))
      .withColumn("s_neg", max(col("__cum")).over(wc) - col("__cum"))
      .withColumn("__rp", row_number().over(
        wk.orderBy(col("s_pos").desc, col("day").asc)))
      .withColumn("__rn", row_number().over(
        wk.orderBy(col("s_neg").desc, col("day").asc)))
    scored.filter(col("__rp") === 1 || col("__rn") === 1)
      .groupBy(col("__k"))
      .agg(max(when(col("__rp") === 1, col("s_pos"))).as("peak_up"),
        max(when(col("__rp") === 1, col("day"))).as("day_up"),
        max(when(col("__rn") === 1, col("s_neg"))).as("peak_down"),
        max(when(col("__rn") === 1, col("day"))).as("day_down"))
      .select(col("__k").as(keyCol), col("peak_up"), col("day_up"),
        col("peak_down"), col("day_down"))
  }

  /** First-touch attribution: every entity's conversions credit the type
    * of its very FIRST event (total order = orderCols, so "first" is
    * engine-independent), the standard acquisition-channel question
    * ("which entry behavior do purchasers start from"). One row per
    * first-touch type: entities acquired, entities that ever converted,
    * total conversions, and conversion rate in integer permille.
    *
    * Scale shape: the first-touch table is one row_number window per
    * entity (or a min_by aggregate — the window keeps tiebreak semantics
    * identical to the SQL twin); conversion counts are a filtered
    * partial-combined aggregate on the same key, joined post-collapse —
    * both sides are |entities|-sized, never event-sized, and partition on
    * the same key. */
  /** Last-touch attribution with a lookback window: each conversion
    * credits the LATEST non-conversion event by the same entity within
    * `lookbackUs` micros before it (strictly earlier; ties inside the
    * window break by the total order, so credit is engine-exact).
    * Complements [[firstTouchAttribution]] — "what acquired them" vs
    * "what closed them". Conversions with an empty lookback window are
    * counted separately (`n_unattributed` on a NULL-type row), so the
    * output conserves conversions.
    *
    * Scale shape: conversions × prior-events is a banded self-join on
    * the entity key (equi-join with a range residual — never a cross
    * product; band width bounds the fan-out to events-per-entity-per-
    * window); the per-conversion argmax is a rank-1 filter (the
    * WindowGroupLimit form), and the final census is a |types|-sized
    * aggregate with the share denominator riding a window over that
    * tiny frame. */
  def lastTouchAttribution(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String, tieCol: String, convType: String,
      lookbackUs: Long): DataFrame = {
    val convs = events.filter(col(typeCol) === convType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ct"),
        col(tieCol).as("__cid"))
    val prior = events.filter(col(typeCol) =!= convType)
      .select(col(keyCol).as("__k"), col(typeCol).as("__pt"),
        col(tsCol).as("__pts"), col(tieCol).as("__pid"))
    val w = Window.partitionBy(col("__k"), col("__cid"))
      .orderBy(col("__pts").desc, col("__pid").desc)
    val credited = convs.join(prior, Seq("__k"))
      .filter(col("__pts") < col("__ct") &&
        col("__pts") >= col("__ct") - lookbackUs)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // conversions whose window held nothing: anti-join, NOT a left join —
    // a left join + rank would silently drop conversions whose entity has
    // prior events that all miss the window
    val orphans = convs.join(
        credited.select(col("__k"), col("__cid")),
        Seq("__k", "__cid"), "left_anti")
      .agg(count(lit(1)).as("n_conversions"))
      .select(lit(null).cast("string").as("last_touch"),
        col("n_conversions"))
    credited.groupBy(col("__pt").as("last_touch"))
      .agg(count(lit(1)).as("n_conversions"))
      .unionByName(orphans)
      .filter(col("n_conversions") > 0)
      .withColumn("share_permille", expr(
        "(1000 * n_conversions) DIV sum(n_conversions) OVER ()"))
  }

  /** Welch's unequal-variance t statistic, each group vs the pooled REST
    * (the [[ksDrift]] contrast pattern): "is this segment's metric level
    * actually different, given both sides' own variances". Exact
    * DECIMAL(38,0) sufficient statistics (n, Σx, Σx²) per group; the rest
    * side is TOTAL − group, so one aggregate pass serves every contrast;
    * means/variances/t materialize in ONE closing double expression
    * quantized to integer micros (the [[lagAutocorr]] oracle-parity
    * posture — no order-dependent float sum anywhere).
    *
    * Sample variances (n−1); groups with n < 2 on either side yield NULL.
    * Scale shape: one partial-combined aggregate over raw rows; the
    * totals ride a window over the |groups|-row frame. */
  def welchT(events: DataFrame, groupCol: String,
      valCol: String): DataFrame = {
    val dec = "DECIMAL(38,0)"
    val g = events
      .select(col(groupCol).as("__g"), col(valCol).as("__x"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("__x").cast(dec)).as("__s"),
        sum((col("__x").cast(dec) * col("__x").cast(dec))).as("__ss"))
    val wAll = Window.partitionBy()
    g.withColumn("__nt", sum(col("n_g")).over(wAll))
      .withColumn("__st", sum(col("__s")).over(wAll))
      .withColumn("__sst", sum(col("__ss")).over(wAll))
      .withColumn("n_rest", col("__nt") - col("n_g"))
      .withColumn("t_micro", expr(
        """CASE WHEN n_g < 2 OR n_rest < 2 THEN NULL ELSE
          |CAST(round((CAST(__s AS DOUBLE)/n_g
          |    - CAST(__st - __s AS DOUBLE)/n_rest) * 1000000 /
          |  sqrt(
          |    ((CAST(__ss AS DOUBLE) - CAST(__s AS DOUBLE)
          |        * CAST(__s AS DOUBLE)/n_g) / (n_g - 1)) / n_g +
          |    ((CAST(__sst - __ss AS DOUBLE) - CAST(__st - __s AS DOUBLE)
          |        * CAST(__st - __s AS DOUBLE)/n_rest) / (n_rest - 1))
          |      / n_rest), 0) AS BIGINT) END""".stripMargin
          .replace("\n", " ")))
      .select(col("__g").as(groupCol), col("n_g"), col("n_rest"),
        col("t_micro"))
  }

  def firstTouchAttribution(events: DataFrame, keyCol: String,
      typeCol: String, orderCols: Seq[Column],
      convType: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val firstTouch = events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(typeCol).as("first_touch"))
    val convs = events.filter(col(typeCol) === convType)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__nc"))
    firstTouch.join(convs, Seq(keyCol), "left")
      .groupBy(col("first_touch"))
      .agg(count(lit(1)).as("n_entities"),
        sum(when(col("__nc").isNotNull, 1L).otherwise(0L)).as("n_converted"),
        sum(coalesce(col("__nc"), lit(0L))).as("n_conversions"))
      .withColumn("conv_permille",
        expr("(1000 * n_converted) DIV n_entities"))
  }

  /** Position-based (U-shaped) multi-touch attribution — the 40/20/40
    * split between [[firstTouchAttribution]] and [[lastTouchAttribution]]:
    * per conversion, the first and last in-window touches take 400‰ each
    * and the middles share the remaining 200‰. All credit is integer
    * permille and each conversion's credits sum to EXACTLY 1000: middles
    * get ⌊200/(n−2)⌋ with the remainder distributed to the earliest
    * middles (largest-remainder discipline, [[graft.operators.Transforms
    * .largestRemainderApportion]]); n=1 → 1000, n=2 → 500/500.
    * Conversions with an empty window keep their 1000 on a NULL touch —
    * credit is conserved, never silently dropped (the orphan anti-join
    * posture of last-touch).
    *
    * Scale shape: one banded join of conversions to prior events on the
    * entity key, one window pass per (entity, conversion) frame for rank
    * and count, then the credit column collapses to |touch types| rows. */
  def positionAttribution(events: DataFrame, keyCol: String,
      typeCol: String, tsCol: String, tieCol: String, convType: String,
      lookbackUs: Long): DataFrame = {
    val convs = events.filter(col(typeCol) === convType)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ct"),
        col(tieCol).as("__cid"))
    val prior = events.filter(col(typeCol) =!= convType)
      .select(col(keyCol).as("__k"), col(typeCol).as("__pt"),
        col(tsCol).as("__pts"), col(tieCol).as("__pid"))
    val frame = Window.partitionBy(col("__k"), col("__cid"))
    val w = frame.orderBy(col("__pts").asc, col("__pid").asc)
    val credited = convs.join(prior, Seq("__k"))
      .filter(col("__pts") < col("__ct") &&
        col("__pts") >= col("__ct") - lookbackUs)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(frame))
      .withColumn("credit", expr(
        """CASE WHEN __n = 1 THEN 1000
          |     WHEN __n = 2 THEN 500
          |     WHEN __rn = 1 OR __rn = __n THEN 400
          |     ELSE 200 DIV (__n - 2) +
          |       CASE WHEN __rn - 1 <= 200 % (__n - 2) THEN 1 ELSE 0 END
          |END""".stripMargin))
    val orphans = convs.join(
        credited.select(col("__k"), col("__cid")).distinct(),
        Seq("__k", "__cid"), "left_anti")
      .agg((count(lit(1)) * 1000L).as("credit_permille"))
      .select(lit(null).cast("string").as("touch"), col("credit_permille"))
    credited.groupBy(col("__pt").as("touch"))
      .agg(sum(col("credit")).as("credit_permille"))
      .unionByName(orphans)
      .filter(col("credit_permille") > 0)
  }

  /** Kaplan–Meier risk table — the survival-analysis sufficient statistic
    * for retention/churn work (Kaplan & Meier 1958, public literature):
    * one row per event time t with the number at risk (entities whose
    * observed duration ≥ t) and the number of events AT t. The survival
    * product Ŝ(t) = Π (1 − d/n) derives row-by-row downstream; emitting
    * the (n, d) table instead of the product keeps every column an exact
    * integer (a float product column would be engine-order-dependent).
    *
    * `durations` rows: (duration, observed) per entity — observed=false
    * = right-censored (still alive at cutoff); censored rows extend the
    * risk set but never count as events, which is the entire point of KM
    * over a naive histogram.
    *
    * Shape: entities collapse to (duration, m, d) counts FIRST (one hash
    * aggregate), then one unpartitioned window over the |distinct
    * durations| rows — the counts-collapse-first posture every
    * distribution query here uses; the single-partition window frame is
    * duration-grid-sized, not data-sized. */
  def kaplanMeierTable(durations: DataFrame, durCol: String,
      observedCol: String): DataFrame = {
    val counts = durations
      .groupBy(col(durCol).as("t"))
      .agg(count(lit(1)).as("__m"),
        sum(when(col(observedCol), 1L).otherwise(0L)).as("n_events"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("n_risk", sum(col("__m")).over(wDesc))
      .filter(col("n_events") > 0)
      .select(col("t"), col("n_risk"), col("n_events"))
  }

  /** Forward-fill (LOCF) resampling onto an hourly grid: per key, each
    * hour carries the LAST observed value at or before it — the standard
    * "carry the close forward" gap treatment a feature pipeline applies
    * before lag/rolling features (a zero-filled gap would fabricate
    * drops). Companion to the count-grid gapfill: same sequence-explode
    * grid, but value-carrying.
    *
    * Per-hour "close" is the value of the LAST event in the hour under
    * the (ts, tiebreak) total order via one `max_by(struct)` aggregate;
    * the fill is `last(ignoreNulls)` over the grid ordered by hour — all
    * windows partition on the key, and the grid is |keys|·|hours| rows,
    * collapsed counts not raw events. The grid spans each key's own
    * [first, last] hour, so there are no leading nulls to fill. */
  def gapfillLocf(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, tieCol: String): DataFrame = {
    val ev = events.select(col(keyCol).as("k"),
      date_trunc("hour", col(tsCol)).as("h"),
      col(tsCol).as("__ts"), col(tieCol).as("__tie"), col(valCol).as("v"))
    val hourly = ev.groupBy(col("k"), col("h"))
      .agg(max(struct(col("__ts"), col("__tie"), col("v"))).as("__last"))
      .select(col("k"), col("h"), col("__last.v").as("close"),
        lit(1L).as("has_data"))
    val grid = hourly.groupBy("k")
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("k"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour")))
          .as("h"))
    val wFill = Window.partitionBy("k").orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("k", "h"), "left")
      .withColumn("close_filled", last(col("close"), ignoreNulls = true)
        .over(wFill))
      .select(col("k"), col("h"),
        coalesce(col("has_data"), lit(0L)).as("observed"),
        col("close_filled"))
  }

  /** Theil–Sen robust trend per key: the LOWER MEDIAN of all pairwise
    * slopes (y₂−y₁)/(x₂−x₁) over strictly-increasing x — the
    * breakdown-point-29% complement of [[trendSlope]]'s least squares (a
    * single spike day drags OLS arbitrarily; the pairwise-slope median
    * shrugs it off). Published estimator (Theil 1950 / Sen 1968).
    *
    * Exactness: each slope is rounded to integer micro-units
    * independently (`round((Δy·1e6)/Δx)` — both factors integers, the
    * double is the same IEEE value on any engine), and the median is
    * `percentile_disc`-style (element at rank ⌈n/2⌉ of the sorted
    * multiset), so no float interpolation ever crosses the oracle
    * boundary. Equal-x pairs carry no slope information and are excluded
    * on both sides.
    *
    * Scale: the self-join is keyed on the entity, so pair fan-out is
    * per-key O(k²) with k = events per entity — bounded by construction
    * for behavioral data (and capped upstream by windowing/sampling when
    * it isn't); the join and both windows share one hash(k) exchange. */
  def theilSenSlope(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val e = df.select(col(keyCol).as("k"), col(xCol).as("x"),
        col(yCol).as("y"))
      .repartition(col("k"))
    val slopes = e.as("a").join(e.as("b").hint("shuffle_hash"),
        col("a.k") === col("b.k") && col("a.x") < col("b.x"))
      .select(col("a.k").as("k"),
        round((col("b.y") - col("a.y")).cast("double") * lit(1000000.0) /
          (col("b.x") - col("a.x")).cast("double")).cast("long").as("s"))
    // median via one hash aggregate (collect per key, sort the k²-bounded
    // array in-task) — measured ~8× faster than the window/row_number form
    // at sf0.1: no sort exchange, slope rows partial-combine map-side.
    slopes.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sort_array(collect_list(col("s"))).as("__ss"))
      .select(col("k").as(keyCol), col("n_pairs"),
        element_at(col("__ss"),
          expr("CAST((n_pairs + 1) DIV 2 AS INT)")).as("slope_micro"))
  }
}
