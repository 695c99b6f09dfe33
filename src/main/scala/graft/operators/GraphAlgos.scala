package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over the synced graph — the analysis layer a
  * graph-sync engine feeds. Same execution discipline as
  * [[Dedup.connectedComponents]]: the edge set is materialized once, every
  * iteration is an equi-join on the node id plus one aggregate (rank
  * records only, never payloads), and lineage is truncated per round so
  * the plan stays flat at any iteration count. At cluster scale the same
  * loop runs with reliable checkpointing.
  */
object GraphAlgos {

  /** PageRank with INTEGER-MICRO arithmetic: ranks are longs in millionths
    * (r₀ = 1 000 000 per node), each iteration computes
    *
    *   r'(v) = (1000 − d)·1000  +  (d · Σ_{u→v} (r(u) DIV outdeg(u))) DIV 1000
    *
    * with d = `dampingPermille`. Every division is integer floor division,
    * so the result is bit-identical on any engine and any execution order —
    * the float formulation would drift across partitionings and could
    * never be oracle-compared. The quantization error is ≤1 micro per
    * edge per iteration: irrelevant for ranking, decisive for testability.
    *
    * Semantics notes: un-normalized variant (mass is injected per node,
    * dangling mass vanishes) — the fixed-iteration form used for feature
    * generation rather than the stochastic-matrix fixpoint. Nodes with no
    * in-edges hold the base (1000−d)·1000.
    */
  /** The rank-iteration input both [[pageRank]] and
    * [[personalizedPageRank]] build from a raw edge list: the distinct
    * edge table with per-source out-degree (window over the same
    * hash(src) clustering the per-iteration join needs anyway) and the
    * distinct node table, both checkpointed. Exposed so callers running
    * SEVERAL rank variants over ONE graph (pagerank + ppr in the same
    * battery) can share the materialization instead of re-scanning and
    * re-shuffling the edge union per variant (guide §2.4). */
  def prepRankGraph(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val e = e0.withColumn("od", count(lit(1)).over(Window.partitionBy("src")))
      .localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    (e, nodes)
  }

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampingPermille: Int = 850,
      checkpointEvery: Int = 4): DataFrame = {
    // validate BEFORE prepRankGraph: the prep eagerly scans, distincts
    // and checkpoints the graph — bad arguments must throw before any
    // of that runs (ADVICE r16)
    require(iters >= 1 && dampingPermille > 0 && dampingPermille < 1000,
      s"iters=$iters dampingPermille=$dampingPermille out of range")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    pageRankPrepped(prepRankGraph(edges, srcCol, dstCol), iters,
      dampingPermille, checkpointEvery)
  }

  /** [[pageRank]] over an already-prepped (edges+out-degree, nodes) pair
    * from [[prepRankGraph]] — identical arithmetic, shared input. */
  def pageRankPrepped(prep: (DataFrame, DataFrame), iters: Int,
      dampingPermille: Int = 850, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1 && dampingPermille > 0 && dampingPermille < 1000,
      s"iters=$iters dampingPermille=$dampingPermille out of range")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    val (e, nodes) = prep
    val base = lit((1000L - dampingPermille) * 1000L)
    var r = nodes.select(col("id"), lit(1000000L).as("r"))
    // Lineage is truncated every `checkpointEvery` rounds, not every round:
    // a checkpoint is a full materialization of the rank table, and for the
    // rounds in between Catalyst plans the chained join+agg as ONE fused
    // DAG (the checkpointed edge scan is reused, only (id, long) rows move)
    // — a 3-iteration run needs no intermediate materialization at all.
    // The arithmetic is integer-only, so cadence cannot change the result.
    var lastCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("id"))
        .select(col("dst").as("id"), expr("r DIV od").as("share"))
        .groupBy("id").agg(sum(col("share")).as("s"))
      val next = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (base + coalesce(expr(s"($dampingPermille * s) DIV 1000"),
            lit(0L))).as("r"))
      r = if (i % checkpointEvery == 0 && i < iters) {
        val c = next.localCheckpoint()
        if (lastCkpt != null) lastCkpt.unpersist()
        lastCkpt = c
        c
      } else next
    }
    r.select(col("id"), col("r").as("rank_micro"))
  }

  /** Personalized PageRank (random walk with restart to a SEED set) — the
    * recommender/expansion scoring variant of [[pageRank]]: teleport mass
    * lands only on seeds, so ranks measure proximity to the seed set
    * rather than global centrality. Identical integer-micro discipline
    * (floor divisions, engine-exact) and identical per-iteration shape
    * (edge⋈rank join + aggregate, lineage cut on a cadence); the seed
    * flag rides the node table so the base term is a projection, never a
    * per-iteration join against the seed list. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, idCol: String, iters: Int,
      dampingPermille: Int = 850, checkpointEvery: Int = 4): DataFrame = {
    // validate before the eager prep runs (ADVICE r16, as in pageRank)
    require(iters >= 1 && dampingPermille > 0 && dampingPermille < 1000,
      s"iters=$iters dampingPermille=$dampingPermille out of range")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery")
    personalizedPageRankPrepped(prepRankGraph(edges, srcCol, dstCol),
      seeds, idCol, iters, dampingPermille, checkpointEvery)
  }

  /** [[personalizedPageRank]] over a [[prepRankGraph]] pair — the seed
    * flag is joined onto the SHARED node table (a broadcast of the tiny
    * seed list), so pagerank and ppr over one graph share every
    * corpus-sized exchange. */
  def personalizedPageRankPrepped(prep: (DataFrame, DataFrame),
      seeds: DataFrame, idCol: String, iters: Int,
      dampingPermille: Int = 850, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1 && dampingPermille > 0 && dampingPermille < 1000,
      s"iters=$iters dampingPermille=$dampingPermille out of range")
    val (e, nodesPlain) = prep
    val sd = seeds.select(col(idCol).cast("long").as("id")).distinct()
      .withColumn("__s", lit(1L))
    val nodes = nodesPlain
      .join(sd, Seq("id"), "left")
      .select(col("id"), coalesce(col("__s"), lit(0L)).as("__seed"))
      .localCheckpoint()
    val base = col("__seed") * lit((1000L - dampingPermille) * 1000L)
    var r = nodes.select(col("id"), (col("__seed") * lit(1000000L)).as("r"))
    var lastCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = e.join(r, e("src") === r("id"))
        .select(col("dst").as("id"), expr("r DIV od").as("share"))
        .groupBy("id").agg(sum(col("share")).as("s"))
      val next = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"), col("__seed"),
          (base + coalesce(expr(s"($dampingPermille * s) DIV 1000"),
            lit(0L))).as("r"))
      r = if (i % checkpointEvery == 0 && i < iters) {
        val c = next.localCheckpoint()
        if (lastCkpt != null) lastCkpt.unpersist()
        lastCkpt = c
        c
      } else next
    }
    r.select(col("id"), col("r").as("ppr_micro"))
  }

  /** Deterministic random-walk corpus — the node2vec/DeepWalk
    * preprocessing stage (Perozzi et al. 2014, public literature): for
    * every start node, a length-`steps` walk whose step-i choice is the
    * neighbor at rank `(start·K + i·97) mod degree` under the per-node
    * (id, neighbor) rank order — Knuth-multiplicative derandomization,
    * identical on any engine/partitioning, so the walk table is
    * oracle-comparable (a seeded RNG walk never would be).
    *
    * Shape: adjacency is ranked ONCE (row_number + count over hash(id) —
    * one exchange) and checkpointed; each step is one equi-join of the
    * frontier on (node, chosen-rank) — (walk, step) records only.
    * `steps` is a small constant, so no lineage management is needed;
    * output is the (start, step, node) corpus an embedding trainer
    * consumes as "sentences". */
  def randomWalks(edges: DataFrame, srcCol: String, dstCol: String,
      steps: Int): DataFrame = {
    require(steps >= 1, s"steps=$steps")
    import org.apache.spark.sql.expressions.Window
    val e0 = edges.select(col(srcCol).cast("long").as("id"),
      col(dstCol).cast("long").as("nb"))
    val adj = e0.union(e0.select(col("nb").as("id"), col("id").as("nb")))
      .distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy("nb")).cast("long"))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("id")))
      .localCheckpoint()
    var walk = adj.select(col("id").as("start")).distinct()
      .select(col("start"), lit(0L).as("step"), col("start").as("node"))
    val segments = Seq.newBuilder[DataFrame]
    segments += walk
    for (i <- 1 to steps) {
      val pick = walk.select(col("start"), col("node").as("__cur"))
        // salt-fold the id below 2³¹−1 before the Knuth multiply (the
        // keepHashPpm convention): identity for every fixture id, and
        // keeps the product under 2⁶³ where ANSI mode throws on raw
        // warehouse-scale surrogate keys
        .withColumn("__r",
          (pmod(col("start"), lit(2147483647L)) * lit(2654435761L)
            + lit(i.toLong * 97L)))
      walk = pick.join(adj, col("__cur") === adj("id") &&
          adj("rnk") === pmod(col("__r"), adj("deg")) + lit(1L))
        .select(col("start"), lit(i.toLong).as("step"),
          col("nb").as("node"))
      segments += walk
    }
    segments.result().reduce(_ unionByName _)
  }

  /** Multi-source BFS: minimum hop count from any source node, bounded at
    * `maxHops` (the bounded form is what both a feature pipeline and a
    * recursive-SQL oracle can express — an unbounded fixpoint over a cyclic
    * graph has no safe SQL twin). Classic frontier iteration: each round
    * expands the previous frontier through one equi-join on the edge
    * source, then anti-joins the visited set so every node is claimed by
    * its FIRST (= minimum) hop. Frontiers are materialized per round
    * (`localCheckpoint`; reliable checkpoint on a cluster) — they are the
    * loop-carried state, and the final result is a union of ≤ maxHops+1
    * already-materialized bounded tables, so lineage never deepens.
    *
    * Scale: each round moves (id) rows only — no payloads, no ranks — and
    * both the expand join and the anti-join hash on the node id, so a
    * cluster run co-partitions every round on the same key. The visited
    * set grows monotonically but stays (id, hop) — 16 bytes/node. */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, idCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops=$maxHops out of range")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val (dist0, n0) = Dedup.ckptLightCounted(
      sources.select(col(idCol).cast("long").as("id")).distinct()
        .select(col("id"), lit(0L).as("hop")))
    var dist = dist0
    var frontier = dist0
    var h = 1
    // ckptLightCounted folds the emptiness probe into the checkpoint's own
    // materialization count: ONE driver job per round, not two
    var exhausted = n0 == 0L
    while (h <= maxHops && !exhausted) {
      val (next, n) = Dedup.ckptLightCounted(
        frontier.join(e, frontier("id") === e("src"))
          .select(col("dst").as("id")).distinct()
          .join(dist, Seq("id"), "left_anti")
          .select(col("id"), lit(h.toLong).as("hop")))
      exhausted = n == 0L
      if (!exhausted) dist = dist.union(next)
      frontier = next
      h += 1
    }
    dist
  }

  /** Strongly connected components by batched forward–backward
    * decomposition (the FW-BW-Trim family: Fleischer–Hendrickson–Pinar
    * 2000, pivots batched one-per-partition as in Slota et al.'s
    * Multistep method) — the scale-safe SCC: loop state is O(|V|+|E|)
    * rows per round (node→partition labels plus two frontier-BFS flag
    * sets), NEVER a reachability pair table. A transitive-closure SCC
    * carries O(|V|·reach) pairs and dies on any real graph; this one
    * moves (id, part) rows only, every join hash-partitions on the node
    * id, and cross-partition edges are dropped as soon as they can no
    * longer be intra-SCC.
    *
    * Per outer round, per current partition (a node set that contains
    * only WHOLE SCCs — the loop invariant):
    *  1. TRIM — a node with no in- or no out-edge inside its partition is
    *     a singleton SCC; emit immediately.
    *  2. PIVOT — one deterministic pseudo-random pivot per partition
    *     (min of a multiplicative hash; min-id pivoting degenerates to
    *     O(n) rounds on an id-ordered chain, the hash keeps splits
    *     quicksort-balanced in expectation).
    *  3. Two partition-constrained frontier BFS waves — forward from the
    *     pivot, backward to it — exactly the [[bfsHops]] discipline.
    *  4. fw ∩ bw = SCC(pivot); emit. Survivors re-key into (fw-only,
    *     bw-only, neither) sub-partitions — no SCC straddles them.
    *
    * Output: (id, scc) with scc = MIN member id (normalized at the end),
    * byte-matching the min-mutual-partner labeling a closure formulation
    * produces. Every partition retires its pivot's SCC each round, so
    * progress is guaranteed; a pathological input that exceeds
    * `maxRounds`/`maxHops` fails LOUDLY instead of mislabeling.
    */
  def stronglyConnectedComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxRounds: Int = 64, maxHops: Int = 512): DataFrame = {
    def ck(df: DataFrame): DataFrame =
      org.apache.spark.sql.GraftSqlBridge.localCheckpointFreshStats(df)
    val eRaw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e0 = eRaw.filter(col("src") =!= col("dst")).distinct()
    // node set from the UNFILTERED edges: a node whose only edge is a
    // self-loop is conventionally a singleton SCC and must not vanish
    // with its dropped loop edge (TRIM retires it in round 1)
    val nodes0 = eRaw.select(col("src").as("id"))
      .union(eRaw.select(col("dst").as("id"))).distinct()
    val (act0, act0N) = Dedup.ckptLightCounted(
      nodes0.select(col("id"), lit(0L).as("part")))
    var act = act0
    if (act0N == 0L) return act.select(col("id"), col("id").as("scc"))
    var e = ck(e0)
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var rounds = 0
    var activeLeft = true
    while (activeLeft && rounds < maxRounds) {
      // edges inside one partition (a cross-partition edge can never be
      // intra-SCC; dropping it also shrinks every later round)
      val pe = ck(e
        .join(act.select(col("id").as("src"), col("part").as("ps")),
          Seq("src"))
        .join(act.select(col("id").as("dst"), col("part").as("pd")),
          Seq("dst"))
        .filter(col("ps") === col("pd"))
        .select(col("src"), col("dst"), col("ps").as("part")))
      val hasOut = pe.select(col("src").as("id")).distinct()
      val hasIn = pe.select(col("dst").as("id")).distinct()
      // counted checkpoints fold every emptiness probe into the round's
      // already-paid materialization job (kept / wave frontiers / act)
      val (kept, keptN) = Dedup.ckptLightCounted(
        act.join(hasOut, Seq("id"), "left_semi")
          .join(hasIn, Seq("id"), "left_semi"))
      // lazy emit (r17): act and kept are both checkpointed, so the
      // singleton anti-join can be recomputed once inside the final
      // normalization job instead of paying its own driver job per round
      out += act.join(kept, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("scc"))
      if (keptN == 0L) activeLeft = false
      else {
        // fold-below-2³¹ before the multiply (ANSI-safe at any id)
        val hashed = pmod(pmod(col("id"), lit(2147483647L))
          * lit(2654435761L), lit(1000000007L))
        val piv = ck(kept.groupBy(col("part"))
          .agg(min(struct(hashed.as("h"), col("id").as("id"))).as("m"))
          .select(col("part"), col("m.id").as("pivot")))
        // ONE direction-tagged wave instead of sequential fw then bw
        // (r17, guide §5 — each BFS hop is a driver job): frontier rows
        // carry the walk direction (0 = forward, 1 = backward) and the
        // edge table is pre-flipped per direction, so both waves expand
        // in the SAME per-hop job and the wave phase costs
        // max(fwHops, bwHops) driver jobs instead of fwHops + bwHops.
        // Reach sets are identical by construction: the tag partitions
        // every row, joins key on (id, part, dir), and the anti-join
        // keys on (id, dir) — two disjoint BFS runs in one frame.
        val peBoth = pe.select(col("src").as("id"), col("dst").as("nxt"),
            col("part"), lit(0L).as("dir"))
          .union(pe.select(col("dst").as("id"), col("src").as("nxt"),
            col("part"), lit(1L).as("dir")))
        // lazy wave base: a projection-union of the checkpointed pivot
        // table — re-reading it inside each hop's job is cheaper than a
        // dedicated checkpoint job per round
        var reach =
          piv.select(col("pivot").as("id"), col("part"), lit(0L).as("dir"))
            .union(piv.select(col("pivot").as("id"), col("part"),
              lit(1L).as("dir")))
        var frontier = reach
        var hops = 0
        var done = false
        while (!done && hops < maxHops) {
          // explicit re-select after the anti-join: a using-columns join
          // moves the using columns FIRST (id, dir, part), and the
          // positional reach.union(next) below would silently swap
          // part/dir without it
          val (next, n) = Dedup.ckptLightCounted(frontier
            .join(peBoth, Seq("id", "part", "dir"))
            .select(col("nxt").as("id"), col("part"), col("dir"))
            .distinct()
            .join(reach, Seq("id", "dir"), "left_anti")
            .select(col("id"), col("part"), col("dir")))
          done = n == 0L
          // plain union of materialized frontiers (bfsHops discipline):
          // no per-hop re-checkpoint of the whole reach set
          if (!done) reach = reach.union(next)
          frontier = next
          hops += 1
        }
        require(done, s"SCC BFS wave exceeded maxHops=$maxHops")
        val fw = reach.filter(col("dir") === 0L)
          .select(col("id"), col("part"))
        val bw = reach.filter(col("dir") === 1L)
          .select(col("id"), col("part"))
        // members/emit stay lazy: every input below is a checkpoint (or
        // a filter of one), so recomputation inside the consuming jobs
        // is a shallow re-read, cheaper than one driver job each per
        // round
        val members = fw.join(bw.select(col("id")), Seq("id"),
          "left_semi")
        out += members.join(piv, Seq("part"))
          .select(col("id"), col("pivot").as("scc"))
        val tagged = kept
          .join(members.select(col("id")), Seq("id"), "left_anti")
          .join(fw.select(col("id"), lit(1L).as("ff")), Seq("id"), "left")
          .join(bw.select(col("id"), lit(1L).as("fb")), Seq("id"), "left")
          .select(col("id"), col("part"),
            coalesce(col("ff"), lit(0L)).as("ff"),
            coalesce(col("fb"), lit(0L)).as("fb"))
        val rekey = tagged.groupBy(col("part"), col("ff"), col("fb"))
          .agg(min(col("id")).as("newpart"))
        val (actNext, actN) = Dedup.ckptLightCounted(
          tagged.join(rekey, Seq("part", "ff", "fb"))
            .select(col("id"), col("newpart").as("part")))
        act = actNext
        e = pe.select(col("src"), col("dst"))
        activeLeft = actN > 0L
      }
      rounds += 1
    }
    require(!activeLeft,
      s"SCC decomposition did not converge in $maxRounds rounds")
    // normalize labels to MIN member id (the pivot was hash-chosen)
    val lab = out.reduce(_ unionByName _)
    val minLab = lab.groupBy(col("scc")).agg(min(col("id")).as("mscc"))
    lab.join(minLab, Seq("scc")).select(col("id"), col("mscc").as("scc"))
  }

  /** Per-node triangle counts over an undirected graph, via the ordered
    * wedge-closing join: edges are canonicalized to `a < b`, wedges
    * `(a,b,c)` with `a < b < c` are built by one self-join on the middle
    * node, and a second equi-join against the edge set closes them — each
    * triangle is enumerated exactly once, so no dedup or division by 6.
    * Both joins are hash equi-joins on node ids; nothing is nested-loop.
    *
    * Scale: wedge count is Σ_b deg⁻(b)·deg⁺(b) under the `a<b<c` split —
    * the id ordering acts as the degree-ordering trick's stand-in (at
    * 100 TB you'd re-rank ids by degree first so high-degree hubs land on
    * the cheap side of every wedge; same plan, one extra rank join). The
    * closing join keys on the (lo, hi) pair, so skew concentrates only
    * where true triangle density does.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct()
    val wedges = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("wa"), col("x.b").as("wb"), col("y.b").as("wc"))
    val tris = wedges.join(e.as("z"),
      col("wa") === col("z.a") && col("wc") === col("z.b"))
      .select(col("wa"), col("wb"), col("wc"))
    tris.select(explode(array(col("wa"), col("wb"), col("wc"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Out-degree distribution: degree per node over the DISTINCT directed
    * edge set, then the histogram (degree → node count) — the two-level
    * aggregate every graph health check starts with (hubs, skew, the
    * power-law tail that decides join strategies). First aggregate hashes
    * on the node id over (src, dst) pairs only; the second runs on
    * |nodes| rows and collapses to |distinct degrees|. */
  def degreeHistogram(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct()
      .groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))

  /** Bounded weighted shortest paths (Bellman-Ford relaxation, `rounds`
    * rounds, integer weights): minimum path cost from any source node
    * using at most `rounds` edges. The bounded form is the one a feature
    * pipeline wants (an unbounded fixpoint needs convergence detection and
    * has no safe SQL twin on cyclic graphs); with integer weights the
    * result is bit-identical on any engine, partitioning, or relaxation
    * order — min() is insensitive to all three.
    *
    * Per round: one equi-join of the current distance table against the
    * edge list on the edge source, then one min-aggregate over the union
    * with the previous distances — the textbook relax step as a join+agg.
    * Only (id, cost) pairs ride the loop (payloads never move), both the
    * join and the aggregate hash on the node id so a cluster run
    * co-partitions every round, and lineage is truncated per round the
    * same as [[pageRank]]/[[bfsHops]]. Unreachable nodes are absent from
    * the result (no sentinel infinities to overflow). */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, sources: DataFrame, idCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds out of range")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("w"))
      .groupBy("src", "dst").agg(min(col("w")).as("w")) // parallel edges: keep cheapest
      .localCheckpoint()
    var dist = sources.select(col(idCol).cast("long").as("id")).distinct()
      .select(col("id"), lit(0L).as("cost")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, dist("id") === e("src"))
        .select(col("dst").as("id"), (col("cost") + col("w")).as("cost"))
      dist = dist.union(relaxed)
        .groupBy("id").agg(min(col("cost")).as("cost"))
        .localCheckpoint()
    }
    dist
  }

  /** HITS hubs & authorities, fixed `rounds`, un-normalized integer
    * arithmetic (Kleinberg 1999): h₀ = 1 for every node, then per round
    * a(v) = Σ_{u→v} h(u) followed by h(u) = Σ_{u→v} a(v). Skipping the
    * norm keeps every value an exact BIGINT — the fixed-round
    * feature-generation form (relative ranking is what consumers use;
    * magnitudes grow ~deg² per round, so bound `rounds` accordingly),
    * same trade as [[pageRank]]'s integer micros. Nodes missing a side
    * hold 0 via the left joins.
    *
    * Per round: two equi-joins against the edge list + two hash
    * aggregates, each moving (id, long) pairs only; lineage truncated per
    * round like the other iterative ops. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds out of range")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    var h = nodes.select(col("id"), lit(1L).as("h"))
    var a: DataFrame = null
    for (i <- 1 to rounds) {
      val auth = e.join(h, e("src") === h("id"))
        .groupBy(col("dst")).agg(sum(col("h")).as("a"))
      a = nodes.join(auth.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("a"), lit(0L)).as("a"))
      val hub = e.join(a, e("dst") === a("id"))
        .groupBy(col("src")).agg(sum(col("a")).as("h"))
      h = nodes.join(hub.withColumnRenamed("src", "id"), Seq("id"), "left")
        .select(col("id"), coalesce(col("h"), lit(0L)).as("h"))
      if (i < rounds) h = h.localCheckpoint()
    }
    h.join(a, Seq("id")).select(col("id"), col("h").as("hub"),
      col("a").as("auth"))
  }

  /** Bounded k-core peeling: repeatedly delete nodes of degree < k from
    * the undirected graph; what survives `rounds` rounds is (converged or
    * not — fixed rounds keep the result deterministic and give it an
    * unrollable SQL twin, the same trade as [[pageRank]]) the cohesive
    * core every fraud/community/robustness pipeline extracts first.
    * Returns (id, deg) of surviving nodes with their within-core degree.
    * Extra rounds past the fixpoint are no-ops, so `rounds` only needs to
    * be an upper bound on the cascade depth.
    *
    * Per round: ONE hash aggregate for degrees, then two semi-joins
    * filtering the edge list on surviving endpoints — all keyed on the
    * node id, so a cluster run co-partitions every round; only (s, d)
    * pairs ride the loop. The survivor set shrinks monotonically, so AQE
    * flips the semi-joins to broadcasts as the core tightens. Lineage
    * truncated per round like the other iterative ops. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k=$k rounds=$rounds out of range")
    val e = edges.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct()
    var und = e.select(col("a").as("s"), col("b").as("d"))
      .union(e.select(col("b").as("s"), col("a").as("d")))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = und.groupBy(col("s")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("s").as("id"))
        .localCheckpoint() // reused by BOTH semi-joins: build once
      und = und
        .join(keep.select(col("id").as("s")), Seq("s"), "left_semi")
        .join(keep.select(col("id").as("d")), Seq("d"), "left_semi")
        .localCheckpoint()
    }
    und.groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
  }

  /** Local clustering coefficient in integer permille: per node,
    * 1000 · (closed wedges / all wedges) = 2000·triangles DIV deg·(deg−1),
    * the "how clique-like is this node's neighborhood" score (transitivity
    * census, spam-ring detection). Degree-<2 nodes score 0 by convention
    * (no wedge to close). Exact integer floor math end to end.
    *
    * Scale shape: the canonical edge set materializes ONCE
    * (`localCheckpoint`) and feeds both the degree aggregate and the
    * wedge-closing triangle join ([[triangleCounts]]) — one scan, then
    * everything hashes on node ids; the final join is |nodes|-sized
    * against |triangle-bearing nodes| and AQE broadcasts the small side. */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val tri = triangleCounts(e, "a", "b").withColumnRenamed("id", "__tid")
    deg.join(tri, col("id") === col("__tid"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("CASE WHEN deg >= 2 THEN (2000 * coalesce(n_tri, 0L)) " +
          "DIV (deg * (deg - 1)) ELSE 0L END").as("coeff_permille"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation between
    * the degrees at the two ends of every edge — positive = hubs attach
    * to hubs (social graphs), negative = hub-and-spoke (tech/biological
    * graphs). One number that predicts robustness and epidemic behavior,
    * and a standard health metric next to [[degreeHistogram]]. Both edge
    * orientations enter the pair multiset (the standard undirected
    * convention, which also makes Σx = Σy by construction). Exact
    * DECIMAL(38,0) sufficient stats; ONE double expression quantizes r
    * to integer micros.
    *
    * Scale shape: degrees are one hash aggregate; each edge picks up its
    * two endpoint degrees via two id-keyed joins (broadcast when the
    * degree table is small, co-partitioned otherwise); the stats collapse
    * in a single partial-combined aggregate. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDegs = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val dec = "DECIMAL(38,0)"
    val pairs = withDegs.select(col("da").as("x"), col("db").as("y"))
      .union(withDegs.select(col("db").as("x"), col("da").as("y")))
    pairs
      .agg(count(lit(1)).as("n_ends"),
        sum(col("x").cast(dec)).as("__sx"),
        sum((col("x") * col("y")).cast(dec)).as("__sxy"),
        sum((col("x") * col("x")).cast(dec)).as("__sxx"))
      .select(col("n_ends"),
        expr("CASE WHEN CAST(n_ends AS DECIMAL(38,0)) * __sxx " +
          "- __sx * __sx = 0 THEN NULL ELSE " +
          "CAST(round(CAST(CAST(n_ends AS DECIMAL(38,0)) * __sxy " +
          "- __sx * __sx AS DOUBLE) * 1000000 / " +
          "CAST(CAST(n_ends AS DECIMAL(38,0)) * __sxx - __sx * __sx " +
          "AS DOUBLE), 0) AS BIGINT) END").as("r_micro"))
  }

  /** Synchronous label propagation (community detection), fixed `rounds`:
    * every node starts labeled with its own id, and each round every node
    * simultaneously adopts the most frequent label among its neighbors
    * (ties → smallest label). Fixed rounds + a total tie order make the
    * result deterministic on any engine or partitioning — asynchronous LPA
    * famously is not, and "run until stable" can oscillate on bipartite
    * structure, so bounded-round synchronous is the reproducible form.
    *
    * Per round: one equi-join of the edge list against the label frame on
    * the node id + two hash aggregates ((id, label) counts, then a
    * `max_by` argmax whose (count, -label) order key is unique within a
    * node, so the argmax is total). Only (id, label, count) triples ever
    * shuffle — payloads never ride the loop — and lineage is truncated
    * every round, the same posture as [[pageRank]]/[[bfsHops]]. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).filter(col("src") =!= col("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
    for (_ <- 1 to rounds) {
      val counts = und.join(labels, und("src") === labels("id"))
        .select(col("dst").as("id"), col("lab"))
        .groupBy("id", "lab").agg(count(lit(1)).as("cnt"))
      labels = counts.groupBy("id")
        .agg(max_by(col("lab"), struct(col("cnt"), -col("lab"))).as("lab"))
        .localCheckpoint()
    }
    labels
  }

  /** Newman–Girvan modularity sufficient statistics of a node partition
    * (Newman 2006, "Modularity and community structure in networks"):
    * per community, member count, internal-edge count e_c, degree mass
    * d_c, and the EXACT-integer modularity contribution numerator
    * 4m·e_c − d_c² over the shared denominator 4m² — so
    * Q = Σ contrib_num / q_den derives exactly downstream and no
    * truncate-vs-floor division semantics ever enter the result. The
    * "score the communities you just detected" step after
    * [[labelPropagation]].
    *
    * Graph reading: undirected simple graph (edges symmetrized +
    * dedup'd, self-loops dropped — the [[labelPropagation]] contract);
    * m = canonical (src < dst) edge count; deg(v) = neighbor count.
    *
    * Scale shape: one symmetrized edge frame feeds both the degree
    * aggregate and the internal-edge test (two hash joins of the
    * canonical edges against the label frame on the node id); everything
    * after the joins is |communities|-sized, and the single m row rides
    * a broadcast — no driver-side scalar, no global collect. */
  def modularityStats(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).filter(col("src") =!= col("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val ec = und.filter(col("src") < col("dst"))
    val lab = labels.select(col("id"), col("lab"))
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val dsum = lab.join(deg, "id")
      .groupBy(col("lab")).agg(count(lit(1)).as("n_nodes"),
        sum(col("deg")).as("d_sum"))
    val ein = ec
      .join(lab.select(col("id").as("src"), col("lab").as("la")), "src")
      .join(lab.select(col("id").as("dst"), col("lab").as("lb")), "dst")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("lab")).agg(count(lit(1)).as("e_in"))
    val mrow = broadcast(ec.agg(count(lit(1)).as("m")))
    dsum.join(ein, Seq("lab"), "left")
      .select(col("lab"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_sum"))
      .crossJoin(mrow)
      .select(col("lab"), col("n_nodes"), col("e_in"), col("d_sum"),
        col("m"),
        (lit(4L) * col("m") * col("e_in") -
          col("d_sum") * col("d_sum")).as("contrib_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"))
  }

  /** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg 2003):
    * for every 2-hop candidate pair (u,w) NOT already connected, the three
    * classic scores — common-neighbor count, Jaccard of the neighborhoods
    * in permille, and the resource-allocation index Σ_z 1/deg(z) over the
    * shared neighbors z (Zhou et al. 2009 — Adamic-Adar's 1/ln(deg)
    * sibling with better empirical precision, and, decisive here, an
    * integer-exact form: each shared neighbor contributes
    * `1000000 DIV deg(z)` micros, so the score never touches a float/log
    * and two engines agree bit-for-bit; same quantization posture as
    * [[pageRank]]).
    *
    * Scale shape: candidate generation is the wedge join — the adjacency
    * list joined with itself on the shared mid-vertex z — which is the
    * standard distributed formulation (no all-pairs stage; work is
    * Σ_z deg(z)², the number of wedges, not n²). The mid-vertex degree
    * rides the wedge row (deg joined on z BEFORE pairing), so the RA sum
    * is a plain aggregate; endpoint degrees for Jaccard attach after the
    * pair aggregate, when the relation has already collapsed to one row
    * per candidate. Existing edges leave via one anti-join against the
    * canonical edge set. Hub skew: a vertex of degree d emits d² wedges —
    * on hub-prone graphs cap the mid-vertex degree upstream (`maxMidDeg`);
    * the cap is explicit, never silently applied (`Int.MaxValue` default).
    */
  /** Minimum spanning forest by Borůvka's algorithm — the distributed MST
    * (Kruskal needs a global edge sort + sequential union-find; Borůvka
    * is "every component grabs its lightest outgoing edge" and halves the
    * component count per round, so ⌈log₂ V⌉ rounds suffice). Edge order
    * is the LEXICOGRAPHIC (w, a, b) total order, which perturbs ties
    * consistently — the forest is therefore unique and engine-exact even
    * with duplicate weights (the classic MST-uniqueness argument applied
    * to the perturbed weights).
    *
    * Per round: each edge picks up both endpoint labels via two id-keyed
    * joins; per-label lightest outgoing edge is one `min_by` aggregate.
    * Labels are maintained INCREMENTALLY by contraction: the new
    * components are the connected components of the picked edges viewed
    * as a graph ON LABELS — a relation sized by the component count
    * (halves per round), not the accumulated forest — and the node table
    * relabels by one label-keyed join ([[graft.operators.Dedup
    * .connectedComponents]] over the label graph; an earlier draft reran
    * CC over the whole forest-so-far per round — 24 s of fixed job
    * overhead at sf0.1 vs ~8 s contracted). The driver only probes
    * emptiness to detect the fixpoint (a bounded-rounds loop, the
    * [[graft.operators.TextAnalysis.bpeMerges]] orchestration posture) —
    * edges never leave executors. Scale: each round is joins +
    * aggregates on (id, label) records; lineage is cut by the
    * fresh-stats checkpoint discipline. */
  def boruvkaMst(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, maxRounds: Int = 10,
      driverFerryMax: Long = 1L << 20): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"),
        col(weightCol).cast("long").as("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(min(col("w")).as("w"))
      .localCheckpoint()
    val nodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct().localCheckpoint()
    var lab = Dedup.ckptLight(
      nodes.select(col("id"), col("id").as("cluster_id")))
    var mst = Dedup.ckptLight(e.filter(lit(false)))
    var done = false
    var round = 0
    def crossEdges(l: DataFrame): DataFrame = e
      .join(l.select(col("id").as("a"), col("cluster_id").as("__ca")), "a")
      .join(l.select(col("id").as("b"), col("cluster_id").as("__cb")), "b")
      .filter(col("__ca") =!= col("__cb"))
    while (!done && round < maxRounds) {
      val tagged = crossEdges(lab)
      // counted checkpoint: ONE driver job yields materialization,
      // emptiness, AND the ferry-bound cardinality (was three jobs)
      val (picks, pickCount) = Dedup.ckptLightCounted(tagged
        .select(explode(array(col("__ca"), col("__cb"))).as("__comp"),
          struct(col("w"), col("a"), col("b"),
            col("__ca"), col("__cb")).as("__e"))
        .groupBy(col("__comp")).agg(min(col("__e")).as("__e"))
        .select(col("__e.a").as("a"), col("__e.b").as("b"),
          col("__e.w").as("w"), col("__e.__ca").as("__ca"),
          col("__e.__cb").as("__cb"))
        .distinct())
      if (pickCount == 0L) done = true
      else {
        mst = Dedup.ckptLight(
          mst.union(picks.select("a", "b", "w")).distinct())
        // contract: CC over the picked edges AS A LABEL GRAPH (component-
        // count-sized — one edge per live component). Small pick sets
        // (≤ driverFerryMax edges, default 2²⁰) union-find on the DRIVER:
        // the distributed CC loop costs ~15 fixed-latency micro-jobs per
        // Borůvka round, which dominates wall time on bounded graphs
        // (7.9 → ~2 s at the bench fixture) while a 1M-edge ferry is
        // trivially bounded — the trainCentroids discipline. Beyond the
        // bound, the pointer-jumped distributed CC takes over; labels are
        // min-member-id either way (ScaleStressSpec pins the two paths
        // edge-identical).
        val merged =
          if (pickCount <= driverFerryMax) {
            val edges = picks.select(col("__ca"), col("__cb"))
              .collect().map(r => (r.getLong(0), r.getLong(1)))
            val parent = scala.collection.mutable.LongMap.empty[Long]
            def find(x: Long): Long = {
              var r = x
              while (parent.getOrElse(r, r) != r) r = parent(r)
              var c = x
              while (parent.getOrElse(c, c) != c) {
                val n = parent(c); parent(c) = r; c = n
              }
              r
            }
            edges.foreach { case (a, b) =>
              val (ra, rb) = (find(a), find(b))
              if (ra != rb) { // min-id root wins: labels match CC's
                if (ra < rb) parent(rb) = ra else parent(ra) = rb
              }
            }
            val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
            val sess = picks.sparkSession
            import sess.implicits._
            ids.map(i => (i, find(i))).toSeq
              .toDF("__old", "__new")
          } else
            graft.operators.Dedup
              .connectedComponents(picks, "__ca", "__cb")
              .select(col("id").as("__old"), col("cluster_id").as("__new"))
        val mergedB =
          if (pickCount <= driverFerryMax) broadcast(merged) else merged
        lab = Dedup.ckptLight(
          lab.join(mergedB,
              lab("cluster_id") === col("__old"), "left")
            .select(col("id"),
              coalesce(col("__new"), col("cluster_id")).as("cluster_id")))
      }
      round += 1
    }
    require(done || crossEdges(lab).isEmpty,
      s"boruvkaMst did not converge in $maxRounds rounds")
    mst
  }

  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      maxMidDeg: Int = Int.MaxValue): DataFrame = {
    val e = edges.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    val adj = e.select(col("a").as("id"), col("b").as("nb"))
      .union(e.select(col("b").as("id"), col("a").as("nb")))
    val deg = adj.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // wedge legs: (z, u, deg z) — the mid-vertex degree joins ONCE, before
    // the self-join fans out, so it never re-aggregates per wedge
    val leg = adj.join(deg, "id")
      .filter(col("deg") <= maxMidDeg)
      .select(col("id").as("z"), col("nb").as("u"), col("deg").as("dz"))
    val right = adj.select(col("id").as("z2"), col("nb").as("w"))
    val cand = leg.join(right, col("z") === col("z2"))
      .filter(col("u") < col("w"))
      .groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("common"),
        sum(expr("1000000 DIV dz")).as("ra_micro"))
    val scored = cand
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("w"), col("deg").as("dw")), "w")
      .withColumn("jaccard_permille",
        expr("(1000 * common) DIV (du + dw - common)"))
    scored.join(e, scored("u") === e("a") && scored("w") === e("b"),
        "left_anti")
      .select(col("u"), col("w"), col("common"), col("ra_micro"),
        col("jaccard_permille"))
  }

  /** Deterministic negative-edge sampling — the counterexample generator a
    * link-prediction trainer pairs with [[linkPrediction]]'s positives:
    * for every node, k NON-edges chosen by hash, reproducible across
    * reruns/engines (no RNG state, same Knuth-multiplicative discipline as
    * `TextAnalysis.mixtureResample`).
    *
    * Shape: nodes land in `buckets` hash buckets; each node probes the
    * `probes` buckets after its own (mod ring), giving a candidate set of
    * ~|V|·probes/buckets per node WITHOUT a |V|² cross join — at scale,
    * `buckets` grows with |V| so per-node candidates stay O(k·c) constant.
    * Real edges leave via one anti-join on the canonical (lo, hi) pair;
    * survivors rank by a pair hash and `WindowGroupLimit` caps each
    * node's output at k map-side.
    *
    * Degenerate corners are well-defined: a node whose probed buckets
    * hold only itself or its true neighbors yields < k negatives (never
    * padded — padding would need the cross join this exists to avoid). */
  def negativeSample(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, buckets: Int = 16, probes: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probes < buckets, s"probes=$probes must be < buckets=$buckets")
    val e = edges.select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    // ids salt-folded below 2³¹−1 before every Knuth multiply (identity
    // at fixture ids; no ANSI overflow at warehouse-scale keys)
    val nodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
      .withColumn("bkt", (pmod(col("id"), lit(2147483647L))
        * lit(2654435761L)) % lit(buckets.toLong))
      .localCheckpoint()
    val probing = nodes.select(col("id").as("u"),
        explode(sequence(lit(1L), lit(probes.toLong))).as("j"))
      .select(col("u"), ((pmod(col("u"), lit(2147483647L))
        * lit(2654435761L)) % lit(buckets.toLong)
        + col("j")) % lit(buckets.toLong) as "pb")
    val cand = probing
      .join(nodes.select(col("id").as("v"), col("bkt")),
        col("pb") === col("bkt"))
      .filter(col("u") =!= col("v"))
      .withColumn("a", least(col("u"), col("v")))
      .withColumn("b", greatest(col("u"), col("v")))
      .join(e, Seq("a", "b"), "left_anti")
    cand
      .withColumn("h",
        (pmod(col("u") * lit(31L) + col("v"), lit(2147483647L))
          * lit(2654435761L)) % lit(1000000L))
      .withColumn("rn", row_number().over(
        Window.partitionBy("u").orderBy(col("h"), col("v"))))
      .filter(col("rn") <= k)
      .select(col("u"), col("v"), col("rn").cast("long").as("rank"))
  }

  /** Landmark closeness centrality: exact BFS distances from a small fixed
    * landmark set, aggregated per node — the standard scalable stand-in
    * for full closeness (all-pairs BFS is |V|·|E| and off the table at any
    * scale; landmark sampling is the published approximation, e.g.
    * Eppstein–Wang). Output: (id, n_landmarks reached within `maxHops`,
    * total_hops, min_hop).
    *
    * Shape: one BFS wave per hop with the frontier keyed on
    * (landmark, node) — the |L| single-source searches share each round's
    * expand join and anti-join instead of running |L| separate loops; all
    * exchanges hash on the node id. State is (src, id, hop) triples only.
    * Iterative-fixpoint checkpointing via [[Dedup.ckptLight]] (stats must
    * not compound across rounds). */
  def closenessCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      landmarks: DataFrame, idCol: String, maxHops: Int): DataFrame = {
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = Dedup.ckptLight(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    val (vis0, n0) = Dedup.ckptLightCounted(
      landmarks.select(col(idCol).cast("long").as("src")).distinct()
        .select(col("src"), col("src").as("id"), lit(0L).as("hop")))
    var visited = vis0
    var frontier = vis0
    var h = 1
    // one driver job per round: the counted checkpoint IS the emptiness
    // probe, and `visited` stays a plain union of already-materialized
    // frontiers (the bfsHops discipline) instead of re-checkpointing the
    // whole visited set every hop
    var exhausted = n0 == 0L
    while (h <= maxHops && !exhausted) {
      val (next, n) = Dedup.ckptLightCounted(
        frontier.join(e, frontier("id") === e("src"))
          .select(frontier("src").as("src"), e("dst").as("id"))
          .distinct()
          .join(visited, Seq("src", "id"), "left_anti")
          .select(col("src"), col("id"), lit(h.toLong).as("hop")))
      exhausted = n == 0L
      if (!exhausted) visited = visited.union(next)
      frontier = next
      h += 1
    }
    visited.groupBy(col("id"))
      .agg(count(lit(1)).as("n_landmarks"), sum(col("hop")).as("total_hops"),
        min(col("hop")).as("min_hop"))
  }

  /** Bounded k-truss peeling (the edge-support sibling of [[kCore]]):
    * repeatedly delete edges in fewer than k−2 triangles, `rounds` times
    * — the cohesive-subgraph extraction that survives the star/hub
    * false-positives k-core admits (a hub with many degree-1 neighbors
    * has high degree but zero triangles). Each round enumerates
    * triangles once via the ordered wedge join (a<b<c, every triangle
    * counted exactly once — the [[triangleCounts]] shape), explodes each
    * triangle to its three edges for the support aggregate, and
    * semi-joins survivors; edge tables are checkpointed per round so
    * lineage and join stats stay flat. Returns surviving edges with
    * their support in the FINAL surviving graph (0 if the last deletions
    * stranded them — bounded rounds, same contract as kCore; the oracle
    * unrolls the identical rounds). */
  def kTruss(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"k=$k out of range")
    require(rounds >= 1 && rounds <= 8, s"rounds=$rounds out of range")
    def support(e: DataFrame): DataFrame = {
      val tri = e.as("e1")
        .join(e.select(col("a").as("__ya"), col("b").as("__zb")),
          col("e1.b") === col("__ya"))
        .join(e.select(col("a").as("__xa"), col("b").as("__xb")),
          col("e1.a") === col("__xa") && col("__zb") === col("__xb"))
        .select(col("e1.a").as("x"), col("e1.b").as("y"),
          col("__zb").as("z"))
      tri.select(explode(array(
          struct(col("x").as("a"), col("y").as("b")),
          struct(col("y").as("a"), col("z").as("b")),
          struct(col("x").as("a"), col("z").as("b")))).as("__e"))
        .select(col("__e.a").as("a"), col("__e.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_tri"))
    }
    var e = Dedup.ckptLight(
      edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
        .filter(col("a") < col("b")).distinct())
    var r = 0
    while (r < rounds) {
      val surv = support(e).filter(col("n_tri") >= k - 2)
        .select(col("a"), col("b"))
      e = Dedup.ckptLight(e.join(surv, Seq("a", "b"), "left_semi"))
      r += 1
    }
    e.join(support(e), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Approximate neighborhood function (HyperBall; Boldi & Vigna 2013):
    * per hop t, the estimated total number of (node, reachable-node) pairs
    * within distance ≤ t — the sketch-propagation form of graph distance
    * analysis (effective diameter, average distance, centrality screens).
    *
    * Each node carries m = 2^p HyperLogLog registers seeded with its own
    * hashed id; each round every node element-wise-MAXes its registers with
    * its out-neighbors' ([[graft.functions.SketchAggs.regMax]] — register
    * max IS HLL set union), so after t rounds node v's sketch estimates
    * |ball(v, t)| exactly as an HLL would estimate the materialized set.
    *
    * Scale: this is THE neighborhood-size algorithm for graphs where exact
    * per-node reachability sets are quadratic — state is m longs per node
    * (constant), each round is one hash join on the node id plus one
    * map-side-combined register-max aggregate, and rounds are bounded.
    * The exact pair-expansion tier (`reach_2hop`) is its correctness
    * witness at test scale. Register init needs no float log: the rho of
    * the (64-p)-bit suffix is derived from `bin()`'s exact MSB position.
    *
    * Returns one row per hop 0..maxHops: (hop, n_nodes, nf_est) with
    * nf_est = Σ_v round(HLL_estimate(sketch_v)). Spark-side only (the
    * sketch fixpoint has no SQL twin) — OperatorsSpec bounds the error
    * against the exact pair expansion. */
  def neighborhoodFunction(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, s"p=$p out of range")
    require(maxHops >= 0, s"maxHops=$maxHops out of range")
    val m = 1 << p
    val e = Dedup.ckptLight(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct())
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    // register init: bucket j = low p bits of xxhash64(id); rho = leading
    // zeros of the remaining 64-p bits + 1, computed EXACTLY via bin()'s
    // MSB position (no float log2 of a >2^53 long).
    val h = xxhash64(col("id"))
    val w = shiftrightunsigned(h, p)
    val rho = when(w === 0L, lit((64 - p + 1).toLong))
      .otherwise(lit((64 - p + 1).toLong) - length(bin(w)).cast("long"))
    var sk = Dedup.ckptLight(nodes
      .withColumn("__j", pmod(h, lit(m.toLong)))
      .withColumn("__rho", rho)
      .select(col("id"), expr(
        s"transform(sequence(0L, ${m - 1}L), i -> IF(i = __j, __rho, 0L))")
        .as("regs")))
    // HLL estimate of one sketch, with the standard small-range
    // (linear-counting) correction; double math is confined to this final
    // read-out — the propagated state itself is exact integer registers.
    val alpha = 0.7213 / (1 + 1.079 / m)
    def estimate(regs: Column): Column = {
      val invSum = aggregate(regs, lit(0.0d),
        (acc, r) => acc + pow(lit(2.0d), -r.cast("double")))
      val zeros = size(filter(regs, _ === 0L)).cast("double")
      val raw = lit(alpha * m * m) / invSum
      round(when(raw <= lit(2.5 * m) && zeros > 0d,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros))
        .otherwise(raw)).cast("long")
    }
    def nfRow(hop: Int, s: DataFrame): DataFrame =
      s.agg(count(lit(1)).as("n_nodes"),
        sum(estimate(col("regs"))).as("nf_est"))
        .select(lit(hop).as("hop"), col("n_nodes"), col("nf_est"))
    var out = nfRow(0, sk)
    var t = 1
    while (t <= maxHops) {
      val nb = e.join(sk, e("dst") === sk("id"))
        .select(e("src").as("id"), col("regs"))
      sk = Dedup.ckptLight(nb.union(sk.select(col("id"), col("regs")))
        .groupBy(col("id"))
        .agg(graft.functions.SketchAggs.regMax(col("regs"), m).as("regs")))
      out = out.union(nfRow(t, sk))
      t += 1
    }
    out
  }
}
