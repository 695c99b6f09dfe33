package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Transforms}

/** Scale-headroom evidence: key operators driven on synthetically
  * MULTIPLIED fixture data (re-keyed unions — 16× documents, 8×
  * lineitem/events) with invariants that only hold if the operator's
  * scaling story is real: exact-dup survivors scale linearly, LSH
  * candidate volume stays bucket-bounded (never quadratic), the heap
  * top-k returns the same winners as the 1× run shifted into each copy,
  * and the windowed rolling sum never crosses copy boundaries. local[4]
  * wall-times are printed for the ledger but not asserted (host drift);
  * correctness invariants are the gate. */
class ScaleStressSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  test("16x documents: exact dedup linear, LSH candidates bucket-bounded") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n1 = docs.count()
    val big = (0 until 16).map(i =>
      docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        // rename EVERY token per copy: shingle vocabularies become
        // copy-disjoint, so all dup/near-dup structure stays WITHIN a
        // copy (a single prefixed tag would leave interior n-grams
        // shared and make copies near-dups of each other)
        regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text")))
      .reduce(_ union _)
    assert(big.count() === 16 * n1)
    val surv1 = Dedup.exactSurvivors(docs, "text", "doc_id").count()
    val survN = timed("16x exactSurvivors") {
      Dedup.exactSurvivors(big, "text", "doc_id").count()
    }
    // each copy's internal dup structure is preserved → exactly 16×
    assert(survN === 16 * surv1)
    // near-dup pairs: copy-disjoint shingle vocabularies keep pairs
    // WITHIN copies → exactly 16× the 1× pair count; any cross-copy
    // explosion (the quadratic failure) would break this equality
    val pairs1 = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 5, thresholdPermille = 100).count()
    val pairsN = timed("16x ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(big, "text", "doc_id",
        n = 5, thresholdPermille = 100).count()
    }
    assert(pairsN === 16 * pairs1,
      s"near-dup pair volume not copy-local: $pairsN vs 16*$pairs1")
  }

  test("rangedRank: ranks invariant under shard count (range boundaries" +
      " can't move a rank)") {
    import graft.operators.Transforms
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    // the same total order under 3 different shard counts — boundary
    // sampling and shard assignment must never change a rank, only WHERE
    // it is computed (the quantile_normalize / vocab_growth contract)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def ranks(parts: String): Map[Long, Long] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Transforms.rangedRank(docs,
          Seq(col("n_chars").asc, col("doc_id").asc), "rk")
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val r1 = ranks("1")
    val r7 = ranks("7")
    val r32 = ranks("32")
    assert(r1.nonEmpty && r1 === r7 && r7 === r32)
    // and the ranks ARE the global row_number: a dense 1..n permutation
    assert(r1.values.toSeq.sorted === (1L to r1.size.toLong))
  }

  test("coverageCurve: decile output invariant under shard count (the " +
      "rangedRank consumer contract, end to end)") {
    import graft.operators.TextAnalysis
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def curve(parts: String): Map[Long, (Long, Long)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try TextAnalysis.coverageCurve(docs, "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val c1 = curve("1"); val c7 = curve("7"); val c32 = curve("32")
    assert(c1.size === 10 && c1 === c7 && c7 === c32)
    assert(c1(10L)._2 === 1000L)
  }

  test("8x lineitem: heap top-k winners identical per copy shard") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val big = (0 until 8).map(i =>
      li.select((col("l_orderkey") + lit(i * 100000000L)).as("k"),
        col("l_extendedprice").as("p"), lit(i.toLong).as("shard")))
      .reduce(_ union _)
    val got = timed("8x topk_agg") {
      big.groupBy(col("shard"))
        .agg(graft.functions.TopKAgg.topK(
          round(col("p") * 100).cast("long"), col("k"), 3).as("t"))
        .select(col("shard"), expr("t.v").as("vs"))
        .as[(Long, Seq[Long])].collect()
    }
    val expect = li.select(round(col("l_extendedprice") * 100)
        .cast("long").as("v"))
      .orderBy(col("v").desc).limit(3).as[Long].collect().toSeq
    assert(got.length === 8)
    got.foreach { case (shard, vs) =>
      assert(vs === expect, s"shard $shard winners drifted")
    }
  }

  test("8x events: rolling window sums never cross copy boundaries") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"),
        expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)").as("t"),
        round(col("value") * 100).cast("long").as("v"))
    val one = Transforms.rollingSum(
      ev.select(col("user_id").as("k"), col("t"), col("v")),
      "k", "t", "v", lookback = 3600L * 1000000L, as = "rs")
      .agg(sum(col("rs")).as("s")).as[Long].collect().head
    val big = (0 until 8).map(i =>
      ev.select((col("user_id") + lit(i * 10000000L)).as("k"),
        col("t"), col("v")))
      .reduce(_ union _)
    val bigSum = timed("8x rollingSum") {
      Transforms.rollingSum(big, "k", "t", "v",
          lookback = 3600L * 1000000L, as = "rs")
        .agg(sum(col("rs")).as("s")).as[Long].collect().head
    }
    // copies are key-disjoint with identical series → exactly 8×
    assert(bigSum === 8 * one)
  }

  test("8x UNBOUNDED part→supp graph: SCC census copy-linear, no pair table") {
    // The residue-free graph the closure-based SCC could never take:
    // every distinct (l_partkey → l_suppkey) edge, node ids uncapped.
    // Cycles live among the ids that appear on both sides; part-only
    // nodes trim out as singletons. Forward–backward decomposition keeps
    // O(|V|+|E|) state, so 8 key-disjoint copies must cost ~8× and the
    // census must scale EXACTLY copy-linearly — a reachability pair
    // table (O(Σ reach(v)) rows, here ~100× |E|) would not.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val e1 = li.select(col("l_partkey").as("s"), col("l_suppkey").as("d"))
      .distinct()
    def census(edges: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) = {
      val lab = graft.operators.GraphAlgos
        .stronglyConnectedComponents(edges, "s", "d")
      val sz = lab.groupBy(col("scc")).agg(count(lit(1)).as("n"))
      val r = sz.agg(count(lit(1)).as("n_sccs"), max(col("n")).as("mx"),
          sum(when(col("n") === 1, 1L).otherwise(0L)).as("single"),
          sum(col("n")).as("n_nodes")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val (s1, mx1, single1, nodes1) = timed("1x unbounded SCC") { census(e1) }
    assert(nodes1 === e1.select(col("s").as("id"))
      .union(e1.select(col("d"))).distinct().count(),
      "SCC labels must cover every node exactly once")
    val big = (0 until 8).map(i =>
      e1.select((col("s") + lit(i * 10000000L)).as("s"),
        (col("d") + lit(i * 10000000L)).as("d")))
      .reduce(_ union _)
    val (s8, mx8, single8, nodes8) = timed("8x unbounded SCC") { census(big) }
    assert(s8 === 8 * s1 && mx8 === mx1 &&
      single8 === 8 * single1 && nodes8 === 8 * nodes1,
      s"census not copy-linear: ($s8,$mx8,$single8,$nodes8) vs 8x($s1,$mx1,$single1,$nodes1)")
  }

  test("8x embeddings: derived SemDeDup cells keep pair volume copy-linear") {
    // The round-8 trap: a FIXED nCells makes in-cell pair volume
    // Σ|cell|² grow quadratically with the corpus. The derived rule
    // (ceil(n / targetMeanCell)) must grow the cell count with the
    // corpus so pair volume stays ~copy-linear.
    import graft.operators.Similarity
    val em = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n1 = em.count()
    val target = 25 // 500-vector fixture → 20 cells at 1×, 160 at 8×
    assert(Similarity.derivedCells(n1, target) ===
      ((n1 + target - 1) / target).toInt)
    assert(Similarity.derivedCells(0L, target) === 1)
    assert(Similarity.derivedCells(Long.MaxValue, target) === (1 << 20))
    def pairVolume(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val out = Similarity.semDedup(df, nCells = 0,
        thresholdPermille = 350, targetMeanCell = target)
      val r = out.groupBy(col("cid")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("cells"), sum(col("n") * col("n")).as("pv"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val (cells1, pv1) = timed("1x semdedup derived") { pairVolume(em) }
    val big = (0 until 8).map(i =>
      em.select((col("id") + lit(i * 1000000000L)).as("id"), col("vec")))
      .reduce(_ union _)
    val (cells8, pv8) = timed("8x semdedup derived") { pairVolume(big) }
    assert(cells1 >= 1 && cells8 > cells1,
      s"derived cell count did not grow with the corpus: $cells1 → $cells8")
    // copy-linear within slack: finer centroids redistribute members, so
    // allow up to ~1.5× per-copy drift but never the 64× a fixed cell
    // count would produce
    assert(pv8 <= 12L * pv1,
      s"in-cell pair volume super-linear: 1x=$pv1 8x=$pv8")
  }

  test("derived IVF cell count: identity at every oracle scale, " +
      "corpus-tracking beyond (the fixed-16 gate-serve quadratic)") {
    import graft.operators.Similarity
    // the floor makes the rule the identity for corpora <= 16*1024 —
    // sf0.001 (500), sf0.01 (2000), sf0.1 (20000 * 2/3 gate slice),
    // and the 10x keyed-replica rung all derive exactly 16
    for (n <- Seq(0L, 1L, 500L, 1333L, 2000L, 13333L, 16384L))
      assert(Similarity.derivedIvfCells(n) === 16, s"n=$n")
    // beyond the floor, cells track the corpus at ~1024 vectors/cell:
    // per-query serve candidates stay bounded at nProbe*1024 instead of
    // nProbe*n/16 (the 100x ann_gate pass that died at ~6.6e9 cosines)
    assert(Similarity.derivedIvfCells(16385L) === 17)
    assert(Similarity.derivedIvfCells(133333L) === 131)
    assert(Similarity.derivedIvfCells(Long.MaxValue) === (1 << 20))
    // and the identity is literal: the derived default reproduces the
    // old fixed-16 tier bit-for-bit on a gate-scale corpus
    val em = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = em.filter(col("id") < 10)
    val derived = Similarity.annTopKIvf(q, em, 5).orderBy(col("qid"),
      col("cos_permille").desc, col("nid")).collect()
    val fixed = Similarity.annTopKIvf(q, em, 5, nCells = 16)
      .orderBy(col("qid"), col("cos_permille").desc, col("nid")).collect()
    assert(derived.toSeq === fixed.toSeq)
  }

  test("derived SRP-LSH plane count: identity at oracle scales, " +
      "occupancy-bounding beyond (the fixed-plane pair-volume quadratic)") {
    import graft.operators.{Dedup, Similarity}
    // 6-plane identity for corpora <= 64*1024 (all gate scales + 10x)
    for (n <- Seq(0L, 500L, 2000L, 20000L, 65536L))
      assert(Similarity.derivedLshPlanes(n) === 6, s"n=$n")
    // beyond: each added plane halves expected occupancy n/2^p back
    // under 1024 — in-bucket pair volume stays ~n*1024, never n^2/64
    assert(Similarity.derivedLshPlanes(66000L) === 7)
    assert(Similarity.derivedLshPlanes(200000L) === 8)
    for (n <- Seq(66000L, 200000L, 1L << 40)) {
      val p = Similarity.derivedLshPlanes(n)
      assert((n >> p) <= 1024L, s"occupancy unbounded at n=$n planes=$p")
    }
    assert(Similarity.derivedLshPlanes(Long.MaxValue) === 40) // cap
    // literal identity: derived default == fixed 6 on a gate-scale corpus
    val em = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val derived = Dedup.embeddingCosineLsh(em, "vec", "id", 300)
      .orderBy(col("a"), col("b")).collect()
    val fixed = Dedup.embeddingCosineLsh(em, "vec", "id", 300, nPlanes = 6)
      .orderBy(col("a"), col("b")).collect()
    assert(derived.toSeq === fixed.toSeq)
  }

  /** Residue-free co-purchase graph: parts co-occurring in an order,
    * node ids uncapped — the unbounded shape the mod-300 demo graphs
    * (mst_forest/ktruss/kcore queries) deliberately avoid. Has real
    * triangles (every ≥3-item order is a clique). */
  private def coGraph(dir: String) = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    li.as("x").join(li.as("y"), col("x.o") === col("y.o") &&
        col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
  }

  private def shift8(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): org.apache.spark.sql.DataFrame =
    (0 until 8).map(i => cols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c) + lit(i * 10000000L)))).reduce(_ union _)

  test("8x UNBOUNDED co-purchase graph: MST copy-linear, ferry == distributed CC") {
    import graft.operators.GraphAlgos
    val e1 = coGraph("/root/testdata/sf0.001")
      .withColumn("w", (col("a") * 13 + col("b") * 31) % 9973)
    def stats(df: org.apache.spark.sql.DataFrame, ferryMax: Long) = {
      val mst = GraphAlgos.boruvkaMst(df, "a", "b", "w",
        driverFerryMax = ferryMax)
      val r = mst.agg(count(lit(1)).as("n"), sum(col("w")).as("tw")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (n1, w1) = timed("1x MST (driver ferry)") { stats(e1, 1L << 20) }
    // the DISTRIBUTED pointer-jump CC path (ferry disabled) must build
    // the IDENTICAL forest — this is the ≥2²⁰-pick fallback a 100 TB
    // graph takes, exercised here for the first time
    val (n1d, w1d) = timed("1x MST (distributed CC)") { stats(e1, 0L) }
    assert((n1d, w1d) === ((n1, w1)),
      s"distributed-CC fallback built a different forest: " +
        s"($n1d,$w1d) vs ($n1,$w1)")
    // weights attach BEFORE the id shift, so each copy carries the 1x
    // weights verbatim and order-preserving (a, b) shifts keep every
    // tie-break identical → the forest replicates EXACTLY per copy
    val (n8, w8) = timed("8x MST") { stats(shift8(e1, Seq("a", "b")), 1L << 20) }
    assert(n8 === 8 * n1, s"MST edge count not copy-linear: $n8 vs 8x$n1")
    assert(w8 === 8 * w1, s"MST total weight not copy-linear: $w8 vs 8x$w1")
  }

  test("8x UNBOUNDED co-purchase graph: kCore/kTruss histograms copy-linear") {
    import graft.operators.GraphAlgos
    val e1 = coGraph("/root/testdata/sf0.001").localCheckpoint()
    def coreHist(df: org.apache.spark.sql.DataFrame) =
      GraphAlgos.kCore(df, "a", "b", k = 3, rounds = 4)
        .groupBy(col("deg")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def trussHist(df: org.apache.spark.sql.DataFrame) =
      GraphAlgos.kTruss(df, "a", "b", k = 3, rounds = 2)
        .groupBy(col("n_tri")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c1 = timed("1x kCore") { coreHist(e1) }
    val t1 = timed("1x kTruss") { trussHist(e1) }
    assert(c1.nonEmpty && t1.nonEmpty, "degenerate graph: nothing survives")
    val big = shift8(e1, Seq("a", "b")).localCheckpoint()
    val c8 = timed("8x kCore") { coreHist(big) }
    val t8 = timed("8x kTruss") { trussHist(big) }
    // node-disjoint copies: every histogram bucket must scale EXACTLY 8x
    // — any cross-copy leakage or super-linear intermediate would break it
    assert(c8 === c1.map { case (k, v) => k -> 8 * v },
      s"kCore degree histogram not copy-linear: $c8 vs $c1")
    assert(t8 === t1.map { case (k, v) => k -> 8 * v },
      s"kTruss support histogram not copy-linear: $t8 vs $t1")
  }
}
