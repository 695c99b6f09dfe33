package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the hot operators — the properties
  * the 100 TB story rests on (filter pushdown into the scan, column
  * pruning, broadcast of dimension sides, exchange reuse across self-join
  * sides, no redundant exchanges). Failing one of these means a plan
  * regression even if results stay correct. Uses sf0.001 — plan shape is
  * scale-invariant, data volume is not the subject here.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  /** Execute df's own QueryExecution (so AQE finalizes) and return the
    * final physical plan string — ONLY the "Final Plan" section (the
    * AdaptiveSparkPlan string repeats the whole tree under
    * "== Initial Plan ==", which would double every node count). */
  private def finalPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  test("scan_parquet: filter pushed to the scan, columns pruned") {
    val plan = q("scan_parquet").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
      s"missing pushdown in:\n$plan")
    // projection is 3 referenced columns + the filter column — nothing else
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
      .forall(read.contains), read)
    assert(!read.contains("l_comment") && !read.contains("l_partkey"), read)
  }

  test("q3/q5 star joins: dimension sides broadcast, fact side never does") {
    for (name <- Seq("q3_revenue", "q5_nation_revenue")) {
      val plan = finalPlan(q(name))
      assert(plan.contains("BroadcastHashJoin"), s"$name lost its broadcasts")
      val bcastScans = plan.linesIterator
        .filter(_.contains("BroadcastExchange")).size
      assert(bcastScans >= 1, s"$name: no BroadcastExchange in final plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name: BNLJ crept in")
      // lineitem (the fact) must not be on a broadcast side
      assert(!plan.contains("CartesianProduct"), name)
    }
  }

  test("range_join: equi-join on (key, bin), never a nested-loop range scan") {
    val plan = finalPlan(q("range_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range predicate fell back to a non-equi join:\n$plan")
    assert(plan.contains("Join") || plan.contains("HashJoin"),
      s"expected an equi-join in:\n$plan")
  }

  test("dedup_minhash/ngram self-joins: signature pipeline computed once") {
    // dedup_ngram_jaccard's QUERY now returns the memoized docDupGraph
    // checkpoint (a Scan ExistingRDD by design), so the exchange-reuse
    // pin targets the underlying operator the memo builds from.
    val pipelines = Seq(
      "dedup_minhash" -> q("dedup_minhash"),
      "dedup_ngram_jaccard" -> graft.operators.Dedup.ngramJaccardPairs(
        spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id",
        n = 5, thresholdPermille = 100))
    for ((name, df) <- pipelines) {
      val plan = finalPlan(df)
      val reused = plan.linesIterator.count(l =>
        l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
      assert(reused >= 1,
        s"$name: self-join sides no longer share one exchange\n" +
          plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("simhash: one rebalance exchange feeds the aggregate, no second shuffle") {
    val df = graft.operators.Dedup.simhash(
      spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
    val plan = finalPlan(df)
    val exchanges = plan.linesIterator.count(l =>
      l.trim.startsWith("+- Exchange") || l.trim.startsWith(":- Exchange")
        || l.trim.startsWith("Exchange"))
    assert(exchanges === 1,
      s"simhash should have exactly the repartition(id) exchange, got $exchanges:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), "sketch agg not planned")
  }

  test("dedup_embed_lsh: bucket pipeline computed once, equi-join on bucket") {
    val plan = finalPlan(q("dedup_embed_lsh"))
    val reused = plan.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
    assert(reused >= 1,
      s"bucket self-join sides no longer share one exchange\n" +
        plan.linesIterator.take(30).mkString("\n"))
    // candidate restriction is an equi-join on the bucket key — all-pairs
    // would plan BroadcastNestedLoopJoin / CartesianProduct
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("upsert_lastwins (agg form): partial aggregate BEFORE the exchange") {
    val plan = finalPlan(q("upsert_lastwins"))
    assert(!plan.contains("Window"), "window crept back in")
    // the property that matters at scale: a partial max_by collapses
    // duplicate keys before the shuffle, so the exchange moves one row per
    // (key, partition) — the window form shuffles every input row. (Spark
    // plans max_by-over-struct as SortAggregate — struct buffers can't
    // hash-aggregate — so per-partition sorts remain; they sort the narrow
    // projection, not the shuffle.)
    val planLines = plan.linesIterator.toList
    val partialIdx = planLines.indexWhere(_.contains("partial_max_by"))
    val exchangeIdx = planLines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(partialIdx >= 0, s"no partial aggregate:\n$plan")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial aggregate must feed the exchange (appear BELOW it):\n$plan")
  }

  test("unigram_logprob: token explode computed once for counts and join") {
    // r16: the count table rides the shared corpus-unigram memo (a
    // materialized checkpoint scan), so the query plan must contain
    // exactly ONE token explode — the per-doc scoring probe — and read
    // the counts from the checkpointed RDD, never a second explode.
    val plan = finalPlan(q("unigram_logprob"))
    val explodes = plan.linesIterator.count(l =>
      l.contains("Generate explode"))
    assert(explodes == 1,
      s"expected exactly one token explode (probe side), got $explodes\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(plan.contains("Scan ExistingRDD"),
      s"counts no longer read the materialized shared table\n" +
        plan.linesIterator.take(30).mkString("\n"))
  }

  test("tfidf_topterms: tf relation reads the shared postings memo, no tokenize in-plan") {
    // r17: the (id, w, tf) relation rides the corpus-postings memo (a
    // materialized checkpoint scan shared with bm25_topk / postings /
    // the unigram-count rollup). The pre-r17 hazard this pin guarded —
    // the df aggregate and the join side each re-running the corpus
    // tokenize unless they shared the tf exchange — is gone: both sides
    // re-read checkpoint blocks, so the pin now asserts the memoized
    // shape itself: no token explode anywhere in the query plan, counts
    // from the materialized table, n_docs still a broadcast.
    val plan = finalPlan(q("tfidf_topterms"))
    val explodes = plan.linesIterator.count(l =>
      l.contains("Generate explode"))
    assert(explodes == 0,
      s"tf relation re-tokenizes instead of reading the postings memo\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(plan.contains("Scan ExistingRDD"),
      s"tf no longer reads the materialized shared table\n" +
        plan.linesIterator.take(30).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), "n_docs must broadcast")
  }

  test("reconcile diff: single full-outer join on the key, both sides pruned") {
    val plan = finalPlan(q("snapshot_diff"))
    assert(plan.contains("FullOuter"), plan.linesIterator.take(5).mkString("\n"))
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(joins === 1, s"diff should be exactly one join, got $joins")
  }

  test("reconcile_delta (changelog form): single full-outer join, no re-plan per branch") {
    // The union-of-two-diffs form re-plans the diff join per branch,
    // doubling the dominant cost; changelog() filters ONE classified pass.
    val plan = finalPlan(q("reconcile_delta"))
    assert(plan.contains("FullOuter"), plan.linesIterator.take(5).mkString("\n"))
    val joins = plan.linesIterator.count(_.contains("Join"))
    assert(joins === 1, s"changelog should be exactly one join, got $joins:\n$plan")
  }

  test("dedup_bloom: one anti-join, shared batch aggregate, bloom probe in plan") {
    val plan = finalPlan(q("dedup_bloom"))
    // the two branches (definitely-new filter / verified anti-join) must
    // share the batch's hash-aggregate exchange, not recompute it
    val reused = plan.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.contains("ReusedQueryStage"))
    assert(reused >= 1, s"branches no longer share the survivor exchange:\n$plan")
    val antiJoins = plan.linesIterator.count(_.contains("LeftAnti"))
    assert(antiJoins === 1, s"expected exactly one anti-join, got $antiJoins:\n$plan")
    assert(plan.contains("might_contain"),
      s"bloom probe fell out of the plan:\n$plan")
  }

  test("decontaminate: benchmark gram side broadcast, no cartesian") {
    // deliberately the pre-filtered two-stream form — every tokenize-once
    // sharing shape measured worse (Dedup.contaminationReport shape note)
    val plan = finalPlan(q("decontaminate"))
    assert(plan.contains("BroadcastHashJoin"),
      s"bench grams no longer broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram join degenerated:\n$plan")
  }

  test("mixture_sample: corpus side joins rates by broadcast only — no full shuffle") {
    val plan = finalPlan(q("mixture_sample"))
    assert(plan.contains("BroadcastHashJoin"),
      s"rates no longer broadcast:\n$plan")
    // the only exchanges should belong to the tiny counts/scale aggregates
    // and broadcasts — the documents relation itself must not hash-shuffle
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"documents relation picked up a shuffle join:\n$plan")
  }

  test("edge_resolve_join: both node dims broadcast semi-joins") {
    val plan = finalPlan(q("edge_resolve_join"))
    val bsemi = plan.linesIterator
      .count(l => l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(bsemi === 2, s"expected 2 broadcast semi joins:\n$plan")
  }

  test("rate_limit: rank filter runs as WindowGroupLimit before the exchange") {
    val plan = finalPlan(q("rate_limit"))
    assert(plan.contains("WindowGroupLimit"), plan)
    // partial mode = the cap applies map-side, pre-shuffle
    assert(plan.contains("Partial") || plan.split("WindowGroupLimit").length > 2,
      s"no map-side cap:\n$plan")
  }

  test("ppjoin_pairs: candidate join moves no arrays; verify joins arrays by id") {
    val plan = finalPlan(q("ppjoin_pairs"))
    // the token self-join's exchanges must not carry the array column —
    // collect_list appears only in the post-candidate verification joins
    val candidateSide = plan.split("SortMergeJoin|ShuffledHashJoin").head
    assert(!candidateSide.contains("collect_list"), plan)
    // verification runs the bounded merge-intersect (early-abort custom
    // expression), not the per-row hash-set builtin
    assert(plan.contains("bounded_intersect"), plan)
    assert(!plan.contains("array_intersect"), plan)
  }

  test("vocab_topk: top-k is TakeOrderedAndProject, not a global sort") {
    val plan = finalPlan(q("vocab_topk"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("mm_decode: container synthesis + header probe plan is shuffle-free") {
    val plan = finalPlan(q("mm_decode"))
    assert(!plan.contains("Exchange"),
      s"decode path must stay project → mapPartitions → project:\n$plan")
    assert(plan.contains("MapPartitions"), plan)
  }

  test("asof_join: one shuffle+sort per side union, no join operator at all") {
    val plan = finalPlan(q("asof_join"))
    assert(!plan.contains("Join"), s"asof must not plan a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("scd2_lookup: probe is the as-of union-window — no " +
      "BETWEEN-residual join between facts and versions") {
    val plan = finalPlan(q("scd2_lookup"))
    // the version probe must be the Window pass, so the only joins left
    // are the fact↔orders FK equi-joins; a join carrying the validity
    // range predicate means the rewrite regressed
    assert(plan.contains("Window"), plan)
    val rangeJoins = plan.linesIterator.count(l =>
      l.contains("Join") && l.contains("eff_to"))
    assert(rangeJoins == 0,
      s"scd2_lookup regressed to the BETWEEN-residual probe:\n$plan")
  }

  test("temporal_reach: closing aggregate rides the pair grid — no " +
      "Expand from countDistinct over the raw path stream") {
    val plan = finalPlan(q("temporal_reach"))
    assert(!plan.contains("Expand"),
      s"temporal_reach re-grew the distinct Expand:\n$plan")
  }

  test("chargram_langid / nbc gram streams: rebalance exchange feeds " +
      "the explode, no interpreted transform-lambda per gram") {
    // the nbc IVM queries memoize to a checkpoint scan, so the gram
    // stream is pinned through the LIVE operator instead
    val live = Seq(
      "chargram_langid" -> (() => q("chargram_langid")),
      "nbc_gram_counts" -> (() => graft.operators.NaiveBayes
        .trainGramCounts(
          spark.read.parquet(s"$dir/documents.parquet"), "text", "lang")))
    for ((name, mk) <- live) {
      val plan = finalPlan(mk())
      assert(plan.contains("Generate explode"), s"$name lost explode")
      // the interpreted formulation shows up as a lambdafunction over
      // transform(...) in the projection
      assert(!plan.contains("lambdafunction"),
        s"$name re-grew the interpreted gram lambda:\n$plan")
      assert(plan.contains("REPARTITION_BY_NUM_PARTITIONS") ||
        plan.contains("RoundRobinPartitioning") ||
        plan.contains("hashpartitioning"),
        s"$name lost the narrow-input rebalance:\n$plan")
    }
  }

  test("nbc_apply scoring joins: class table broadcasts, argmax window " +
      "is doc-partitioned (never global), no nested loop") {
    // the memoized query checkpoints; pin the LIVE scoring shape instead
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val m = graft.operators.NaiveBayes.nbcTrain(
      docs.filter(col("doc_id") % 2 === 0), "text", "lang")
    val plan = finalPlan(graft.operators.NaiveBayes.nbcScore(
      docs.filter(col("doc_id") % 2 === 1), "text", "doc_id", "lang", m))
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the ONLY nested loops allowed are the 1-row corpus (v, d) scalar
    // and ≤|langs|-row class-table crosses, re-appearing across the
    // plan's reuse branches (the PLANS.md family-1 pattern, classified
    // at 5 for nbc_refresh); the corpus-side gram join must stay a
    // hash join, and every cross must be a BuildRight broadcast
    val bnljLines = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnljLines.size <= 5,
      s"nbc scoring grew ${bnljLines.size} nested loops (5 classified):\n$plan")
    assert(bnljLines.forall(l => l.contains("BuildRight") &&
      l.contains("Cross")), s"non-cross nested loop:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("Window") &&
      l.contains("doc_id")), s"argmax window lost its partition:\n$plan")
  }

  test("triangle_count: bounded edge set broadcasts, never nested-loop") {
    val plan = finalPlan(q("triangle_count"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"triangle joins must stay equi-joins:\n$plan")
    // the ~6.3k-edge set should be small enough for AQE to broadcast
    assert(plan.contains("BroadcastHashJoin"),
      s"bounded edge set not broadcast:\n$plan")
  }

  test("rolling_window: single exchange on the partition key, one Window") {
    val plan = finalPlan(q("rolling_window"))
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("cube_agg: one Expand + one aggregate pair — never a scan per set") {
    val plan = finalPlan(q("cube_agg"))
    val expands = plan.linesIterator.count(_.contains("Expand"))
    assert(expands >= 1, s"cube lost its Expand:\n$plan")
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"cube must scan the fact table once, got $scans")
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"grouping sets must share one shuffle:\n$plan")
  }

  test("embed_centroid: partial agg collapses before the one exchange") {
    val plan = finalPlan(q("embed_centroid"))
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
    // two HashAggregates (partial + final) around that exchange
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"missing partial aggregate:\n$plan")
  }

  test("ann_ivfpq: codebook/probe/dtable sides broadcast, no nested loop past assignment") {
    val plan = finalPlan(q("ann_ivfpq"))
    // candidate scoring must be broadcast equi-joins (qc, dt, codebook);
    // the only nested-loop allowed is the nCells/nCentroids broadcast
    // fan-out inside assignment/encoding (bounded by constants)
    assert(plan.contains("BroadcastHashJoin"),
      s"probe/dtable joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join anywhere in IVF-PQ:\n$plan")
  }

  test("fuzzy_pairs: candidate join keys on the block — never all-pairs") {
    val plan = finalPlan(q("fuzzy_pairs"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"blocking key fell out of the join:\n$plan")
    // Levenshtein must run on candidates (above the join), not inside a
    // join condition evaluated per cross-pair of a nested loop
    assert(plan.contains("Join"), plan)
  }

  test("hist_prices / corr_stats: one partial-combined aggregate, no extra exchange") {
    for (name <- Seq("hist_prices", "corr_stats")) {
      val plan = finalPlan(q(name))
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning"))
      assert(exchanges == 1, s"$name: expected 1 exchange, got $exchanges:\n$plan")
      val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
      assert(aggs >= 2, s"$name: missing partial aggregate:\n$plan")
    }
  }

  test("profile_cols: one scan feeds the stack generate — not a scan per column") {
    val plan = finalPlan(q("profile_cols"))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
  }

  test("zorder_layout: pure column arithmetic — zero exchanges") {
    val plan = finalPlan(q("zorder_layout"))
    assert(!plan.contains("Exchange"),
      s"z-value must be a projection, never a shuffle:\n$plan")
  }

  test("skew_report: global top-k via TakeOrderedAndProject, total broadcast") {
    val plan = finalPlan(q("skew_report"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-20 must not be a global sort:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the one-row total must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("winsorize: percentile stats side broadcasts back to the fact rows") {
    val plan = finalPlan(q("winsorize"))
    assert(plan.contains("BroadcastHashJoin"),
      s"stats join must broadcast the |groups|-row side:\n$plan")
  }

  test("grouping_sets: one scan + Expand — not a scan per set") {
    val plan = finalPlan(q("grouping_sets"))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 scan, got $scans:\n$plan")
    assert(plan.contains("Expand"), plan)
  }

  test("nullsafe_join: <=> still plans a hash join, never a nested loop") {
    val plan = finalPlan(q("nullsafe_join"))
    assert(plan.contains("HashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }

  test("array_hof: fused array projection — zero exchanges") {
    val plan = finalPlan(q("array_hof"))
    assert(!plan.contains("Exchange"),
      s"higher-order fns must not force a shuffle or explode:\n$plan")
  }

  test("scd2_build: one window pass — a single hash exchange") {
    val plan = finalPlan(q("scd2_build"))
    val n = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning")
        && !l.contains("ReusedExchange"))
    assert(n == 1, s"expected exactly 1 exchange, got $n:\n$plan")
  }

  test("pareto_front: no dominance join — no BNLJ, no single-partition window") {
    val plan = finalPlan(q("pareto_front"))
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"skyline fell back to the O(n^2) dominance join:\n$plan")
    // the prefix-max must ride per-bucket windows + a tiny offset table,
    // never one global-order window over all distinct x
    val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    // the offsets frame (|buckets| rows) is the only legitimate
    // single-partition stage
    assert(single <= 1, s"global-order window crept in:\n$plan")
  }

  test("quantile_normalize: pooled rank is range-partitioned — no data-sized" +
      " single-partition window") {
    val plan = finalPlan(q("quantile_normalize"))
    // the pooled side rides rangedRank: the range exchange runs inside
    // the pool's checkpoint job, so the final plan reads the materialized
    // pool (ExistingRDD) under per-shard windows; the only legitimate
    // single-partition stages are the |shards|-row offset cumsum and the
    // 1-row total aggregate (rank correctness vs shard count is pinned in
    // ScaleStressSpec)
    assert(plan.contains("ExistingRDD"),
      s"pooled rank lost its materialized range pool:\n$plan")
    val single = plan.linesIterator
      .count(_.contains("Exchange SinglePartition"))
    assert(single <= 2, s"data-sized global window crept back in:\n$plan")
  }

  test("ivm_agg: state ∪ delta maintained by ONE partial-combined aggregate") {
    val plan = finalPlan(q("ivm_agg"))
    // partial aggregates must appear under the union (map-side collapse)
    // and the merge agg above it — no join between state and delta
    assert(plan.contains("Union"), plan)
    assert(!plan.linesIterator.exists(l => l.contains("Join")
        && !l.contains("ReusedExchange")),
      s"IVM merge must be an aggregate, not a join:\n$plan")
  }

  test("mm_energy: byte decode + explode + aggregate, no UDF, partial-agg") {
    val plan = finalPlan(q("mm_energy"))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"decode must stay codegen'd:\n$plan")
    assert(plan.contains("Generate explode"), plan)
    // partial aggregate collapses (asset, frame) before the one exchange
    val n = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning")
        && !l.contains("ReusedExchange"))
    assert(n == 1, s"expected exactly 1 exchange, got $n:\n$plan")
  }

  test("keyness: corpus tokenized once — marginals re-aggregate, broadcast back") {
    val plan = finalPlan(q("keyness"))
    // st is checkpointed: the corpus scan runs in the checkpoint job,
    // so the final plan replays it at most once (0 = fully reused)
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(scans <= 1,
      s"marginals replayed the corpus tokenize, got $scans scans:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("mutual_info: marginals come back broadcast — no single-partition window") {
    val plan = finalPlan(q("mutual_info"))
    val single = plan.linesIterator.count(_.contains("Exchange SinglePartition"))
    // two legitimate global stages, both 1-row aggregates over |cells|
    // rows: the grand-total marginal and the final result
    assert(single <= 2, s"marginals must not globally sort/window:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("mm_ahash: pixel decode stays codegen'd — no UDF, explode present") {
    val plan = finalPlan(q("mm_ahash"))
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"pixel decode must be expressions:\n$plan")
    assert(plan.contains("Generate explode"), plan)
  }

  test("hits_scores: iterative rounds stay hash joins over checkpointed edges") {
    val plan = finalPlan(q("hits_scores"))
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), plan)
  }

  test("ann_reciprocal: pair scores computed once, mutual join is hash") {
    val plan = finalPlan(q("ann_reciprocal"))
    assert(!plan.contains("CartesianProduct"),
      s"pair scoring must be the pruned a<b join, not a cartesian:\n$plan")
    assert(plan.contains("HashJoin"), plan)
  }

  test("round-6 pair miners: every join keyed, never a nested loop") {
    // link_predict (wedge join), source_jaccard (term self-join),
    // ewma_daily + attribution_last (banded self-joins: equi on the key,
    // range as residual filter)
    for (name <- Seq("link_predict", "source_jaccard",
        "ewma_daily", "attribution_last")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name: candidate join lost its equi key:\n$plan")
    }
    // basket_pairs carries ONE legitimate BNLJ: the single-row basket
    // total riding a broadcast cross (the tfidf n_docs pattern); the
    // pair-mining joins themselves must stay hash
    val bp = finalPlan(q("basket_pairs"))
    assert(!bp.contains("CartesianProduct"), bp)
    assert(bp.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      s"basket_pairs: more than the one totals-broadcast BNLJ:\n$bp")
  }

  test("q21/q4: EXISTS and NOT-EXISTS stay hash semi/anti joins") {
    for (name <- Seq("q21_waiting", "q4_priority")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name: the lateness residual demoted an equi join:\n$plan")
      assert(plan.contains("LeftSemi"), s"$name: no semi join in:\n$plan")
    }
    val p21 = finalPlan(q("q21_waiting"))
    assert(p21.contains("LeftAnti"), s"q21: NOT EXISTS lost its anti join")
  }

  test("temporal_reach: follow-up probe is the binned equi join, no BNLJ") {
    val plan = finalPlan(q("temporal_reach"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"temporal window fell back to a non-equi join:\n$plan")
  }

  test("fs_linkage: candidates key on the block, JW only post-join") {
    val plan = finalPlan(q("fs_linkage"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"fs_linkage lost its blocking equi key:\n$plan")
  }

  test("q15/q22: max-row and stats sides come back as broadcasts") {
    for (name <- Seq("q15_top_supplier", "q22_idle_cust")) {
      val plan = finalPlan(q(name))
      assert(plan.contains("BroadcastExchange"),
        s"$name: 1-row aggregate side not broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), name)
    }
  }

  test("scd2_lookup/covisit/churn: residual-carrying joins stay hash") {
    for (name <- Seq("scd2_lookup", "covisit_pairs")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"$name: lost its equi key:\n$plan")
    }
    // churn carries exactly ONE BNLJ — the legitimate 1-row max-month
    // cross (audit family 1); the presence probe itself must stay an
    // ANTI hash join
    val churn = finalPlan(q("churn_rate"))
    assert(churn.split("BroadcastNestedLoopJoin").length - 1 <= 1, churn)
    assert(churn.contains("LeftAnti"), churn)
    assert(!churn.contains("CartesianProduct"), churn)
  }

  test("topk_heap: buffer aggregate, no window and no pre-shuffle sort") {
    val plan = finalPlan(q("topk_heap"))
    assert(plan.contains("ObjectHashAggregate"),
      s"topk_agg lost its imperative-aggregate plan:\n$plan")
    assert(!plan.contains("Window"),
      s"topk_heap must not fall back to a window rank:\n$plan")
    // partial aggregate runs BEFORE the exchange: only k-pair buffers
    // shuffle (the whole point vs topk_per_group)
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val aggIdx = plan.lastIndexOf("ObjectHashAggregate")
    assert(exIdx >= 0 && aggIdx > exIdx,
      s"no map-side partial aggregate below the exchange:\n$plan")
  }

  test("info_gain: one unpivoted scan — marginals re-aggregate, broadcast") {
    val plan = finalPlan(q("info_gain"))
    // one Expand (stack) over one orders scan; marginal joins broadcast
    assert(plan.linesIterator.count(_.trim.startsWith("Expand")) <= 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // cells are checkpointed: the final plan reads the materialized cell
    // RDD, never the fact scan (0 file scans here; the one real scan ran
    // at checkpoint time)
    val ordersScans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("orders")).size
    assert(ordersScans <= 1, s"info_gain re-scans orders:\n$plan")
  }

  test("cdc_chunks: per-row byte synthesis — no interpreted transform " +
      "lambda anywhere in the plan") {
    // the array-column form re-ran the 4096-element transform 3× per doc
    // through the Generate guard (Filter + Project + the Generate itself)
    // — 14.5 s vs 0.8 s warm; this pin keeps the row form
    val plan = finalPlan(q("cdc_chunks"))
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda crept back into cdc_chunks:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // one documents scan, 2 columns
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents")).size
    assert(scans == 1, s"cdc_chunks scans documents $scans times:\n$plan")
  }

  test("winnow_fingerprints: gram hash is a codegen'd projection and " +
      "selection is one window pass") {
    val plan = finalPlan(q("winnow_fingerprints"))
    // the first form built per-window struct arrays in nested interpreted
    // transforms (26.9 s vs 3.9 s); selection must stay lag/lead columns
    assert(!plan.contains("lambdafunction"),
      s"interpreted lambda crept back into winnow_fingerprints:\n$plan")
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 1, s"winnow selection fragmented into $windows " +
      s"window passes:\n$plan")
  }

  test("gopher_repetition / dup_spans: window n-grams travel as numeric " +
      "keys, never strings") {
    // r16: the dup_spans QUERY serves the shared span-table memo (a
    // checkpoint scan), so the numeric-key property is pinned on the
    // OPERATOR plan that builds the table — the plan that actually
    // moves window grams.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val forms: Seq[(String, DataFrame)] = Seq(
      "gopher_repetition" -> q("gopher_repetition"),
      "dup_spans" -> graft.operators.TextAnalysis.dupSpans(
        docs, "text", "doc_id", k = 8))
    for ((name, df) <- forms) {
      val plan = finalPlan(df)
      // the string forms shuffled k× the corpus text (22.5 s / 5.8 s);
      // concat_ws in the plan means gram STRINGS are being built again
      // (the one allowed concat_ws is gopher_repetition's per-doc
      // n_chars, which takes the whole token array, not a slice)
      val gramConcats = plan.linesIterator
        .count(l => l.contains("concat_ws") && l.contains("slice"))
      assert(gramConcats == 0,
        s"$name rebuilds gram strings (concat_ws over slice):\n$plan")
      assert(plan.contains("xxhash64"), s"$name lost its hash keys")
    }
  }

  test("streaming cluster gate: one codegen'd column predicate — no " +
      "typed Row-lambda deserialization round-trip") {
    // parquet-backed input: a local Seq would let the optimizer fold
    // the whole predicate into the LocalTableScan and prove nothing
    val df = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("vec"))
    val fc = graft.operators.Similarity.FrozenCentroids(Seq(
      (0L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0 else 0.1), 1.0),
      (1L, Array.tabulate(64)(i => if (i % 2 == 1) 1.0 else 0.1), 1.0)))
    val gated = graft.streaming.StreamingClusterGate.gate(
      df, "vec", "doc_id", fc, Map(0L -> 1000000L, 1L -> 500000L))
    val plan = finalPlan(gated)
    assert(!plan.contains("DeserializeToObject") &&
      !plan.contains("SerializeFromObject"),
      s"gate must not round-trip rows through a typed lambda:\n$plan")
    // "*(n) Filter" is the WholeStageCodegen marker in the compact
    // plan string — an interpreted FilterExec prints without the star
    assert("""\*\(\d+\) Filter""".r.findFirstIn(plan).isDefined,
      s"gate filter fell out of whole-stage codegen:\n$plan")
  }
}
