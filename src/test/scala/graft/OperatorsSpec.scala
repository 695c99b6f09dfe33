package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, TextAnalysis, Transforms}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("dot product: ragged arrays yield null, not a partial sum") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)),
      (Seq(1.0, 2.0), Seq(10.0, 20.0))).toDF("a", "b")
    val out = df.select(graft.functions.DotProduct(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect()
    assert(out.toSeq === Seq(None, Some(50.0)))
  }

  test("patchGrid: one row per tile, cross of per-axis counts") {
    val decoded = Seq((1L, 17, 33), (2L, 16, 16)).toDF("asset_id", "width", "height")
    val out = Multimodal.patchGrid(decoded, tile = 16)
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    assert(out(1L).length === 2 * 3) // ceil(17/16) x ceil(33/16)
    assert(out(2L).length === 1)
    assert(out(1L).map(t => (t._2, t._3)).toSet ===
      (for (x <- 0 until 2; y <- 0 until 3) yield (x, y)).toSet)
  }

  test("triangleCounts: K4 + pendant — per-node counts, direction/dup-proof") {
    import graft.operators.GraphAlgos
    // K4 on {1,2,3,4} has C(4,3)=4 triangles, each node in 3 of them;
    // pendant edge 4-5 closes nothing. Feed edges in MIXED direction and
    // duplicated — canonicalize+distinct must make that invisible.
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val messy = (k4 ++ k4.map(_.swap) ++ Seq((5L, 4L), (4L, 5L))).toDF("s", "d")
    val got = GraphAlgos.triangleCounts(messy, "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // self-loops must not fabricate triangles
    val withLoop = messy.union(Seq((1L, 1L)).toDF("s", "d"))
    assert(GraphAlgos.triangleCounts(withLoop, "s", "d")
      .as[(Long, Long)].collect().toMap === got)
  }

  test("kCore: pendant chain peels in cascade, K4 core survives") {
    import graft.operators.GraphAlgos
    // K4 on {1..4} plus a chain 4-5-6: k=2 peeling needs TWO rounds to
    // clear the chain (6 falls first, exposing 5) — the cascade is the
    // point. The K4 survives with within-core degree 3. Mixed directions
    // and duplicate edges must be invisible.
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val g = (k4 ++ Seq((4L, 5L), (5L, 6L)) ++ k4.map(_.swap)).toDF("s", "d")
    val got = GraphAlgos.kCore(g, "s", "d", k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one round is NOT enough: 6 drops but 5 still shows (deg was 2)
    val oneRound = GraphAlgos.kCore(g, "s", "d", k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneRound.contains(5L) && !oneRound.contains(6L))
    // k above the max degree empties the graph
    assert(GraphAlgos.kCore(g, "s", "d", k = 10, rounds = 2).isEmpty)
  }

  test("personalizedPageRank: mass concentrates near seeds, integer-exact") {
    import graft.operators.GraphAlgos
    // star: seed 1 → {2, 3}; far chain 4 → 5 (no seed). After 1 iter:
    // 1: base 150000; 2,3: 850·(1000000/2)/1000 = 425000; 4,5: 0 — the
    // restart term lands ONLY on seeds.
    val g = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("s", "d")
    val seeds = Seq(1L).toDF("id")
    val got1 = GraphAlgos.personalizedPageRank(g, "s", "d", seeds, "id",
        iters = 1).as[(Long, Long)].collect().toMap
    assert(got1 === Map(1L -> 150000L, 2L -> 425000L, 3L -> 425000L,
      4L -> 0L, 5L -> 0L))
    // iter 2: seed keeps its base; 2,3 get 850·(150000/2)/1000 = 63750;
    // node 5 still 0 (4 has no mass to push)
    val got2 = GraphAlgos.personalizedPageRank(g, "s", "d", seeds, "id",
        iters = 2).as[(Long, Long)].collect().toMap
    assert(got2(1L) === 150000L)
    assert(got2(2L) === 63750L && got2(3L) === 63750L)
    assert(got2(5L) === 0L)
    // global pagerank on the same graph gives 4 and 5 nonzero rank —
    // the personalization is what zeroes them
    val pr = GraphAlgos.pageRank(g, "s", "d", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(pr(5L) > 0L)
  }

  test("golden-record pick idiom: highest quality wins, ties to smallest id") {
    // the max(struct(q, -id, field)) aggregate the golden_record query
    // fuses: deterministic best-member field selection without a window.
    val m = Seq((1L, 10L, 700L, "web"), (1L, 11L, 900L, "mail"),
      (1L, 12L, 900L, "feed"), // q tie with 11 → smaller id (11) wins
      (2L, 20L, 100L, "arch")).toDF("cluster_id", "doc_id", "q", "source")
    val got = m.groupBy(col("cluster_id"))
      .agg(max(struct(col("q"), (-col("doc_id")).as("negid"),
        col("source"))).getField("source").as("best_source"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "mail", 2L -> "arch"))
  }

  test("sliding_distinct_approx within 5% of the exact sliding tier") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("sliding_distinct_approx")(spark, dir)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val exact = SparkEntry.queries("sliding_distinct")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(approx.nonEmpty && approx.keySet === exact.keySet)
    approx.foreach { case (k, est) =>
      val ex = exact(k)
      assert(math.abs(est - ex) <= math.max(1L, ex / 20),
        s"$k: est $est vs exact $ex")
    }
  }

  test("hll_intersect estimates within 5% of exact pairwise overlap") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("hll_intersect")(spark, dir)
      .as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    val events = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("user_id"))
    val exact = events.as("x").join(events.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("a"), col("y.event_type").as("b"))
      .agg(countDistinct(col("x.user_id")).as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (a, b, est) =>
      val ex = exact.getOrElse((a, b), 0L)
      assert(math.abs(est - ex) <= math.max(1L, ex / 20),
        s"pair ($a,$b): est $est vs exact $ex")
    }
  }

  test("randomWalks: every step follows an edge, deterministic, full coverage") {
    import graft.operators.GraphAlgos
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("s", "d")
    val walks = GraphAlgos.randomWalks(g, "s", "d", steps = 3)
      .as[(Long, Long, Long)].collect()
    // one walk per node, steps 0..3 all present
    assert(walks.count(_._2 == 0L) === 4)
    assert(walks.length === 16)
    val adj = Set((1L,2L),(2L,3L),(3L,4L),(4L,1L),(1L,3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val byWalk = walks.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).toList)
    byWalk.foreach { case (start, path) =>
      assert(path.head === start)
      path.sliding(2).foreach { case List(a, b) =>
        assert(adj.contains((a, b)), s"walk $start: $a -> $b not an edge")
      }
    }
    // rerun-stable (the whole point of derandomization)
    val again = GraphAlgos.randomWalks(g, "s", "d", steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === walks.toSet)
  }

  test("closenessCentrality: path distances from two landmarks, hop cap") {
    import graft.operators.GraphAlgos
    // path 0-1-2-3-4-5-6 (directed input, treated undirected), landmarks
    // {0, 6}, maxHops 4. Node 2: hops 2 (from 0) + 4 (from 6) = 6 from
    // both; node 3: 3+3; node 5 is 5 hops from 0 — only landmark 6
    // reaches it (hop 1). Node 0 itself: 0 from 0, 6 > cap from 6.
    val path = (0L until 6L).map(i => (i, i + 1)).toDF("s", "d")
    val lms = Seq(0L, 6L).toDF("id")
    val got = GraphAlgos.closenessCentrality(path, "s", "d", lms, "id", 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(2L) === ((2L, 6L, 2L)))
    assert(got(3L) === ((2L, 6L, 3L)))
    assert(got(5L) === ((1L, 1L, 1L)))
    assert(got(0L) === ((1L, 0L, 0L)))
    assert(got(6L) === ((1L, 0L, 0L)))
    assert(got(1L) === ((1L, 1L, 1L))) // landmark 6 is 5 hops away: cut
  }

  test("negativeSample: no true edges, deterministic, brute-force parity") {
    import graft.operators.GraphAlgos
    // ring 0-1-...-9-0: every node has 2 true neighbors out of 9 others.
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("s", "d")
    val edgeSet = (0L until 10L).map(i =>
      (math.min(i, (i + 1) % 10), math.max(i, (i + 1) % 10))).toSet
    val got = GraphAlgos.negativeSample(ring, "s", "d",
        k = 3, buckets = 4, probes = 2)
      .as[(Long, Long, Long)].collect()
    // (a) nothing sampled is a real edge, no self-pairs
    got.foreach { case (u, v, _) =>
      assert(u !== v)
      assert(!edgeSet.contains((math.min(u, v), math.max(u, v))), s"($u,$v)")
    }
    // (b) ranks contiguous from 1, at most k per node
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
      assert(rows.length <= 3)
    }
    // (c) exact parity with an independent in-memory reimplementation
    val K = 2654435761L
    val expect = (for {
      u <- 0L until 10L; j <- 1L to 2L
      pb = ((u * K) % 4 + j) % 4
      v <- 0L until 10L
      if (v * K) % 4 == pb && v != u
      if !edgeSet.contains((math.min(u, v), math.max(u, v)))
    } yield (u, v, ((u * 31 + v) * K) % 1000000L))
      .groupBy(_._1).flatMap { case (u, cs) =>
        cs.sortBy(c => (c._3, c._2)).take(3).zipWithIndex
          .map { case ((_, v, _), i) => (u, v, i + 1L) }
      }.toSet
    assert(got.toSet === expect)
    // (d) rerun-stable
    val again = GraphAlgos.negativeSample(ring, "s", "d",
        k = 3, buckets = 4, probes = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(again === got.toSet)
  }

  test("clusteringCoefficients: triangle=1000, star center=0, pendant=0") {
    import graft.operators.GraphAlgos
    // Triangle {1,2,3} with a pendant 3-4: nodes 1,2 have deg 2 and one
    // closed wedge → 1000 permille; node 3 has deg 3, one triangle of
    // the three wedges → 2000*1 DIV 6 = 333; node 4 deg 1 → 0.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = GraphAlgos.clusteringCoefficients(g, "s", "d")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, 1000L)), 2L -> ((2L, 1L, 1000L)),
      3L -> ((3L, 1L, 333L)), 4L -> ((1L, 0L, 0L))))
  }

  test("bigramTopK: adjacent pairs only, count ties broken by bigram") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramTopK(docs, "text", 10)
      .as[(String, Long)].collect().toSeq
    // "a b": doc1 twice + doc2 once; "b a": doc1; "b c": doc2;
    // single-token and empty docs contribute nothing
    assert(got === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("rollingSum: value-bounded frame — ties mutual, boundary inclusive") {
    // user 1: ties at t=100 see each other (RANGE, not ROWS); t=3700 is
    // EXACTLY lookback after t=100 → inclusive; t=3701 drops the t=100 pair.
    val ev = Seq((1L, 100L, 10L), (2L, 100L, 20L), (3L, 3700L, 5L),
      (4L, 3701L, 1L), (5L, 9999L, 7L)).toDF("id", "sec", "v")
      .withColumn("u", lit(1L))
    val got = Transforms.rollingSum(ev, "u", "sec", "v", 3600L, "roll")
      .select(col("id"), col("roll")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 30L, 2L -> 30L, 3L -> 35L, 4L -> 6L, 5L -> 7L))
  }

  test("pageRank: hand-computed integer-micro ranks, sink and cycle") {
    import graft.operators.GraphAlgos
    // 1→{2,3}, 2→{3,4}, 3→1; 4 is a sink (contributes nothing)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 1L))
      .toDF("src", "dst")
    val r2 = GraphAlgos.pageRank(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    // iter1: c = {1:1000000, 2:500000, 3:1000000, 4:500000}
    //   → r1 = {1:1000000, 2:575000, 3:1000000, 4:575000}
    // iter2: shares 1→500000×2, 2→287500×2, 3→1000000
    //   → r2 = {1:1000000, 2:575000, 3:150000+floor(850·787500/1000),
    //           4:150000+floor(850·287500/1000)}
    assert(r2 === Map(1L -> 1000000L, 2L -> 575000L,
      3L -> 819375L, 4L -> 394375L))
    // duplicate edges must not double-count (distinct inside)
    val dup = GraphAlgos.pageRank(edges.union(edges), "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(dup === r2)
    // checkpoint cadence is an execution knob, never a semantic one:
    // integer arithmetic ⇒ bit-identical at every cadence
    val everyRound = GraphAlgos.pageRank(edges, "src", "dst", iters = 2,
      checkpointEvery = 1).as[(Long, Long)].collect().toMap
    assert(everyRound === r2)
  }

  test("bfsHops: min-hop over diamond + cycle, cap, unreachable, multi-source") {
    import graft.operators.GraphAlgos
    // diamond 1→{2,3}→4, chain 4→5→6→7, cycle 7→1, island 100→101
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 1L), (100L, 101L)).toDF("src", "dst")
    def run(src: Seq[Long], cap: Int) =
      GraphAlgos.bfsHops(edges, "src", "dst", src.toDF("id"), "id", cap)
        .as[(Long, Long)].collect().toMap
    // diamond gives ONE hop-2 claim on 4 (not two); cycle re-visits 1 at
    // hop 7 but first-claim (hop 0) wins; island never appears
    assert(run(Seq(1L), 4) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 4L))
    // cap truncates the frontier exactly
    assert(run(Seq(1L), 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    // multi-source: nearest source claims each node
    assert(run(Seq(1L, 6L), 2) === Map(1L -> 0L, 6L -> 0L, 2L -> 1L,
      3L -> 1L, 7L -> 1L, 4L -> 2L))
    // frontier exhaustion stops early (island source, 1 real edge)
    assert(run(Seq(100L), 4) === Map(100L -> 0L, 101L -> 1L))
  }

  test("mixtureResample: scarcest stratum whole, rates hit targets, whitelist") {
    // strata: a=100 rows, b=300 rows; targets 500/500 permille → b is
    // 3× over-represented: scale = min(100·1e6/500, 300·1e6/500) = 200000,
    // rate_a = 500·200000/100 = 1e6 ppm (keep all), rate_b = 333333 ppm.
    val rows = (1L to 100L).map(i => (i, "a")) ++
      (1001L to 1300L).map(i => (i, "b")) ++
      (9001L to 9050L).map(i => (i, "zz")) // not in the target → dropped
    val df = rows.toDF("id", "stratum")
    val kept = TextAnalysis.mixtureResample(df, col("stratum"), col("id"),
      Map("a" -> 500, "b" -> 500))
      .as[(Long, String)].collect()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStratum("a") === 100) // rate 1e6 ppm keeps every row
    assert(!byStratum.contains("zz")) // whitelist semantics
    // b's keep decision is the documented hash predicate, row-exact
    val expB = (1001L to 1300L).count(i => (i * 2654435761L) % 1000000L < 333333L)
    assert(byStratum("b") === expB)
    // deterministic: same input → same rows
    val again = TextAnalysis.mixtureResample(df, col("stratum"), col("id"),
      Map("a" -> 500, "b" -> 500)).as[(Long, String)].collect()
    assert(again.toSet === kept.toSet)
  }

  test("tfIdf: tf, df and score on a hand-checked corpus") {
    val docs = Seq(
      (1L, "apple banana APPLE"),
      (2L, "banana cherry"),
      (3L, "cherry  cherry durian")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdf(docs, "text", "doc_id")
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got.size === 6) // distinct (doc, term) pairs
    assert(got((1L, "apple"))._3 === 2L)  // case-folded tf
    assert(got((1L, "apple"))._4 === 1L)  // df: only d1
    assert(got((2L, "banana"))._4 === 2L) // d1 and d2
    assert(got((3L, "cherry"))._3 === 2L) // whitespace-run tokenizing
    got.values.foreach { case (_, _, tf, df, n, score) =>
      assert(n === 3L)
      assert(math.abs(score - tf * math.log(3.0 / df)) < 1e-12)
    }
    // rare term outranks common at equal tf under the (tf, df) ordering
    val top = Transforms.topKPerGroup(
        TextAnalysis.tfIdf(docs, "text", "doc_id"), Seq(col("id")),
        Seq(col("tf").desc, col("term_df").asc, col("term").asc), 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    assert(top === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
  }

  test("rangeJoin: binned equi-join equals naive range filter (seeded random)") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(7)
    // negative values exercise floor-vs-truncate binning; spans up to 8×
    // the bin width exercise multi-bin interval explosion
    val pts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextLong() % 10000L))
      .toDF("pid", "k", "pt")
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextLong() % 10000L
      (i.toLong, rnd.nextInt(3).toLong, s, s + rnd.nextInt(800).toLong)
    }.toDF("iid", "k", "s", "e")
    val got = RangeJoin.pointInInterval(pts, ivs, "pt", "s", "e",
        binWidth = 100L, keys = Seq("k"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.as("p").join(ivs.as("i"),
        col("p.k") === col("i.k") &&
          col("p.pt") >= col("i.s") && col("p.pt") <= col("i.e"))
      .select(col("p.pid"), col("i.iid")).as[(Long, Long)].collect().toSet
    assert(want.nonEmpty && got === want)

    // inclusive on both bounds, exactly once even when the interval spans
    // many bins and the point sits on a bin edge
    val p1 = Seq((1L, 200L), (2L, 500L), (3L, 199L), (4L, 501L))
      .toDF("pid", "pt")
    val i1 = Seq((9L, 200L, 500L)).toDF("iid", "s", "e")
    val hits = RangeJoin.pointInInterval(p1, i1, "pt", "s", "e", binWidth = 50L)
      .select("pid").as[Long].collect().sorted
    assert(hits.toSeq === Seq(1L, 2L))
  }

  test("resizePlan: aspect-fit into maxSide box, never upscaling") {
    val decoded = Seq(
      (1L, 640, 480), // downscale, exact 1000-divisible products
      (2L, 16, 16),   // already fits: scale capped at 1000, dims unchanged
      (3L, 20, 40),   // portrait: height is the long side
      (4L, 33, 10))   // scale not 1000-divisible: floor semantics
      .toDF("asset_id", "width", "height")
    val out = Multimodal.resizePlan(decoded, maxSide = 32)
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(out(1L) === ((1L, 50L, 32L, 24L)))
    assert(out(2L) === ((2L, 1000L, 16L, 16L)))
    assert(out(3L) === ((3L, 800L, 16L, 32L)))
    assert(out(4L) === ((4L, 969L, 31L, 9L))) // floor(33*969/1000), floor(10*969/1000)
    // invariant: the long side never exceeds maxSide
    assert(out.values.forall(t => math.max(t._3, t._4) <= 32))
  }

  test("decodeAssets really parses BMP and WAV headers from hand-built files") {
    import java.nio.{ByteBuffer, ByteOrder}
    def bmpBytes(w: Int, h: Int): Array[Byte] = {
      // 54-byte BMP: file header (14) + BITMAPINFOHEADER (40), no pixels
      val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(54).putInt(0).putInt(54)
      b.putInt(40).putInt(w).putInt(h)
      b.putShort(1).putShort(24) // planes, bpp
      b.array()
    }
    def wavBytes(blockAlign: Int, dataBytes: Int): Array[Byte] = {
      // canonical 44-byte PCM WAV header; data payload not required
      val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36 + dataBytes).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      b.putInt(44100).putInt(44100 * blockAlign)
        .putShort(blockAlign.toShort).putShort(16)
      b.put("data".getBytes).putInt(dataBytes)
      b.array()
    }
    val assets = Seq(
      (1L, "image", bmpBytes(640, 480)),
      (2L, "image", bmpBytes(7, -9)), // negative height = top-down rows
      (3L, "audio", wavBytes(4, 400)), // 400/4 = 100 PCM frames
      (4L, "image", "not a container at all".getBytes("UTF-8")))
      .toDF("asset_id", "modality", "content")
    val got = Multimodal.decodeAssets(assets).collect()
      .map(d => d.asset_id -> d).toMap
    assert((got(1L).width, got(1L).height, got(1L).n_frames) === ((640, 480, 1)))
    assert((got(2L).width, got(2L).height) === ((7, 9)))
    assert((got(3L).width, got(3L).height, got(3L).n_frames) === ((0, 0, 100)))
    // unprobeable bytes keep the documented deterministic stub
    val n = "not a container at all".getBytes("UTF-8").length
    assert((got(4L).width, got(4L).height) === ((16 + n % 64, 16 + (n / 7) % 64)))

    // probe rejects truncated/corrupt headers rather than mis-parsing
    import graft.operators.HeaderProbe
    assert(HeaderProbe.bmp("BM".getBytes).isEmpty)
    assert(HeaderProbe.wav(wavBytes(0, 400)).isEmpty) // zero block align
    assert(HeaderProbe.wav("RIFFxxxxJUNK".getBytes).isEmpty)
  }

  test("HeaderProbe parses PNG IHDR and GIF screen descriptor bytes") {
    import graft.operators.HeaderProbe
    import java.nio.{ByteBuffer, ByteOrder}
    def pngBytes(w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(33) // big-endian by default
      b.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      b.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
      b.put(8.toByte).put(6.toByte) // bit depth, color type
      b.array()
    }
    def gifBytes(ver: String, w: Int, h: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(13).order(ByteOrder.LITTLE_ENDIAN)
      b.put(s"GIF$ver".getBytes).putShort(w.toShort).putShort(h.toShort)
      b.array()
    }
    assert(HeaderProbe.png(pngBytes(1920, 1080)).contains(
      HeaderProbe.Probe(1920, 1080, 1)))
    assert(HeaderProbe.gif(gifBytes("89a", 320, 200)).contains(
      HeaderProbe.Probe(320, 200, 1)))
    assert(HeaderProbe.gif(gifBytes("87a", 1, 1)).contains(
      HeaderProbe.Probe(1, 1, 1)))
    // corrupt/truncated forms are rejected, not mis-parsed
    assert(HeaderProbe.png(pngBytes(1920, 1080).take(20)).isEmpty)
    val notIhdr = pngBytes(4, 4); notIhdr(12) = 'X'.toByte
    assert(HeaderProbe.png(notIhdr).isEmpty)
    assert(HeaderProbe.gif(gifBytes("88a", 2, 2)).isEmpty) // bad version
    assert(HeaderProbe.gif(gifBytes("89a", 0, 5)).isEmpty) // zero width
    // the synthesis columns round-trip through the probe
    val df = Seq((1L, 33, 47), (2L, 500, 1)).toDF("id", "w", "h")
    val png = df.select(Multimodal.pngContent(col("w"), col("h")).as("c"))
      .as[Array[Byte]].collect()
    assert(HeaderProbe.probe(png(0)).contains(HeaderProbe.Probe(33, 47, 1)))
    assert(HeaderProbe.probe(png(1)).contains(HeaderProbe.Probe(500, 1, 1)))
    val gif = df.select(Multimodal.gifContent(col("w"), col("h")).as("c"))
      .as[Array[Byte]].collect()
    assert(HeaderProbe.probe(gif(0)).contains(HeaderProbe.Probe(33, 47, 1)))
    assert(HeaderProbe.probe(gif(1)).contains(HeaderProbe.Probe(500, 1, 1)))
  }

  test("HeaderProbe.jpeg: marker walk to SOF, skipping DHT and fill bytes") {
    import graft.operators.{HeaderProbe, Multimodal}
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // SOI + APP0(JFIF) + DHT (C4: inside the SOF code range but NOT a
    // frame — must be walked over) + a fill byte + progressive SOF2
    // (h=0x0150=336, w=0x0280=640) + 1 grayscale component
    val realistic = hx("FFD8" +
      "FFE000104A46494600010100000100010000" +
      "FFC400160001010101010101010000000000000000000102" +
      "FF" + // fill byte before the next marker
      "FFC2000B08" + "0150" + "0280" + "01011100")
    assert(HeaderProbe.jpeg(realistic).contains(
      HeaderProbe.Probe(640, 336, 1)))
    assert(HeaderProbe.probe(realistic).contains(
      HeaderProbe.Probe(640, 336, 1)))
    // RSTn/TEM standalone markers have no length field
    val standalone = hx("FFD8" + "FFD0" + "FF01" +
      "FFC0000B08" + "0010" + "0020" + "01011100")
    assert(HeaderProbe.jpeg(standalone).contains(
      HeaderProbe.Probe(32, 16, 1)))
    // SOS before any SOF, truncation mid-segment, and a non-marker byte
    // are rejected, never mis-parsed
    assert(HeaderProbe.jpeg(hx("FFD8FFDA0002")).isEmpty)
    assert(HeaderProbe.jpeg(realistic.take(30)).isEmpty)
    assert(HeaderProbe.jpeg(hx("FFD800C0000B080010002001011100")).isEmpty)
    assert(HeaderProbe.jpeg(hx("FFD8FFC0000B08" + "0000" + "0020" +
      "01011100")).isEmpty) // zero height
    // synthesis round-trips through the probe (w=33,h=47 / w=500,h=1)
    val df = Seq((1L, 33, 47), (2L, 500, 1)).toDF("id", "w", "h")
    val jp = df.select(Multimodal.jpegContent(col("w"), col("h")).as("c"))
      .as[Array[Byte]].collect()
    assert(HeaderProbe.probe(jp(0)).contains(HeaderProbe.Probe(33, 47, 1)))
    assert(HeaderProbe.probe(jp(1)).contains(HeaderProbe.Probe(500, 1, 1)))
  }

  test("lastWinsByKey keeps exactly the ordered winner") {
    val df = Seq(("k1", 1, "a"), ("k1", 3, "c"), ("k1", 2, "b"),
      ("k2", 1, "x")).toDF("external_id", "seq", "v")
    val got = Transforms.lastWinsByKey(df, "external_id", col("seq").desc)
      .select("external_id", "v").as[(String, String)].collect().toMap
    assert(got === Map("k1" -> "c", "k2" -> "x"))
  }

  test("lastWinsByKeyAgg agrees with the window form") {
    val df = Seq(("k1", 1, 5L, "a"), ("k1", 3, 1L, "c"), ("k1", 3, 9L, "d"),
      ("k2", 1, 0L, "x")).toDF("external_id", "seq", "sub", "v")
    val win = Transforms.lastWinsByKey(df, "external_id",
      col("seq").desc, col("sub").desc)
      .as[(String, Int, Long, String)].collect().toSet
    val agg = Transforms.lastWinsByKeyAgg(df, "external_id",
      col("seq"), col("sub"))
      .as[(String, Int, Long, String)].collect().toSet
    assert(agg === win)
    assert(agg === Set(("k1", 3, 9L, "d"), ("k2", 1, 0L, "x")))
  }

  test("lastWinsByKeyAgg null-rank contract: null loses to any value; all-null groups emit one row") {
    val df = Seq(
      ("k1", Some(2), "b"), ("k1", None, "z"), ("k1", Some(1), "a"),
      ("k2", None, "p"), ("k2", None, "q"), // all-null ranks
      ("k3", None, "only"))
      .toDF("external_id", "seq", "v")
    // contract: a null rank sorts SMALLEST in the agg form (struct-max is
    // nulls-first ascending), which matches the window form's `.desc`
    // default of NULLS LAST — so a null-ranked row loses to any non-null
    // one, and an all-null group still yields exactly one row. Ties on all
    // rank columns are settled by the trailing tiebreak column, making
    // both forms deterministic here.
    val agg = Transforms.lastWinsByKeyAgg(df, "external_id",
      col("seq"), col("v"))
      .as[(String, Option[Int], String)].collect().toSet
    val win = Transforms.lastWinsByKey(df, "external_id",
      col("seq").desc, col("v").desc)
      .as[(String, Option[Int], String)].collect().toSet
    assert(agg === win)
    assert(agg === Set(("k1", Some(2), "b"), ("k2", None, "q"),
      ("k3", None, "only")))
  }

  test("packSequences: contiguous concat-then-cut layout per shard") {
    val docs = Seq(
      (1L, "a b c"),           // 3 tokens
      (2L, "d e f g h"),       // 5
      (3L, "i j"),             // 2
      (4L, (1 to 12).map(i => s"t$i").mkString(" ")) // 12 > maxTokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "text", "doc_id",
        lit("s0"), maxTokens = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_id", "pack_offset")
      .as[(Long, Long, Long, Long)].collect()
    // cum:     doc1=0, doc2=3, doc3=8, doc4=10
    assert(out === Array(
      (1L, 3L, 0L, 0L),
      (2L, 5L, 0L, 3L),
      (3L, 2L, 1L, 0L),   // starts exactly at the second pack boundary
      (4L, 12L, 1L, 2L))) // longer than a pack: spans packs by design
    // invariant: offsets are the exclusive running count mod maxTokens,
    // so pack_id*8 + pack_offset is strictly increasing by n_tokens
    val pos = out.map(r => r._3 * 8 + r._4)
    assert(pos.zip(out.map(_._2)).sliding(2).forall {
      case Array((p1, n1), (p2, _)) => p2 == p1 + n1
      case _ => true
    })
  }

  test("sampleStratified: deterministic, content-keyed, rate-respecting") {
    val docs = (1 to 400).map(i => (i.toLong,
      if (i % 2 == 0) "en" else "de", s"doc text number $i"))
      .toDF("doc_id", "lang", "text")
    val once = TextAnalysis.sampleStratified(docs, col("lang"), col("text"),
      Map("en" -> 250, "de" -> 1000)).select("doc_id")
      .as[Long].collect().toSet
    // deterministic: same input → same sample, rerun and repartitioned
    val again = TextAnalysis.sampleStratified(docs.repartition(7),
      col("lang"), col("text"), Map("en" -> 250, "de" -> 1000))
      .select("doc_id").as[Long].collect().toSet
    assert(once === again)
    // de at 1000‰ is keep-all; en at 250‰ keeps roughly a quarter
    assert(once.count(_ % 2 == 1) === 200)
    val enKept = once.count(_ % 2 == 0)
    assert(enKept > 20 && enKept < 80, s"en kept $enKept of 200")
    // rate monotonicity: a higher rate's sample is a superset
    val enHalf = TextAnalysis.sampleStratified(docs, col("lang"), col("text"),
      Map("en" -> 500, "de" -> 1000)).select("doc_id")
      .as[Long].collect().toSet
    assert(once.subsetOf(enHalf))
  }

  test("unigramLogProb: common-token prose outscores rare-token soup") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "zqx jvw pfft blorp qwrk xyzzy")).toDF("doc_id", "text")
    val lp = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    // docs 1/2 share most tokens (high corpus probability); doc 3 is all
    // hapaxes — strictly lower mean log-prob
    assert(lp(1L) > lp(3L) && lp(2L) > lp(3L), lp.toString)
    // identical token distributions score identically
    val twice = TextAnalysis.unigramLogProb(
      docs.union(docs.withColumn("doc_id", col("doc_id") + 10)),
      "text", "doc_id").as[(Long, Long)].collect().toMap
    assert(twice(1L) === twice(11L))
  }

  test("topKPerGroup with deterministic tiebreak") {
    val df = Seq(("g", 1, 10.0), ("g", 2, 10.0), ("g", 3, 5.0),
      ("h", 4, 1.0)).toDF("grp", "id", "score")
    val got = Transforms.topKPerGroup(df, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), 2)
      .select("grp", "id").as[(String, Int)].collect().toSet
    assert(got === Set(("g", 1), ("g", 2), ("h", 4)))
  }

  test("langId prefers declared order on ties, und on no hits") {
    val df = Seq((1L, "the cat and the dog"), (2L, "der hund und die katze"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("l")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) === "en" && got(2L) === "de" && got(3L) === "und")
  }

  test("TokenSetCount equals the composed CountInSet(wsTokens(lower)) form") {
    // edge inputs: repeated hits, mixed case, every \s-class separator,
    // leading/trailing separators (empty tokens), empty string, no hits
    val texts = Seq(
      "The the THE and of", "  \t le\u000Bla\nle \f\r", "", "   ",
      "der und das ist", "nohits here at all", "of-of of, of")
    val words = Seq("the", "and", "of", "le", "la", "und")
    val df = texts.toDF("text")
    val fused = df.select(
      graft.functions.TokenSetCount(col("text"), words).as("c"))
      .as[Int].collect().toSeq
    val composed = df.select(graft.functions.CountInSet(
      TextAnalysis.wsTokens(lower(col("text"))), words).as("c"))
      .as[Int].collect().toSeq
    assert(fused === composed)
    assert(fused === Seq(5, 3, 0, 0, 1, 0, 1))
  }

  test("CurationGate equals the composed three-predicate filter (seeded random)") {
    val rnd = new scala.util.Random(7)
    val stop = TextAnalysis.stopwords.flatMap(_._2)
    val fillers = Seq("cat", "dog", "Zebra", "qq", "x1", "!!", "...", "héllo")
    val seps = Seq(" ", "  ", "\t", "\n", "", "\f", "\r")
    def randText(): String = {
      val n = rnd.nextInt(60)
      val body = (0 until n).map { _ =>
        if (rnd.nextBoolean()) stop(rnd.nextInt(stop.size))
        else fillers(rnd.nextInt(fillers.size))
      }.mkString(seps(rnd.nextInt(seps.size)))
      // random leading/trailing whitespace exercises the trim/split quirks
      seps(rnd.nextInt(seps.size)) * rnd.nextInt(2) + body +
        seps(rnd.nextInt(seps.size)) * rnd.nextInt(2)
    }
    val df = ((0 until 300).map(i => (i.toLong, randText())) :+
      (9998L, "") :+ (9999L, "   \t  ")).toDF("doc_id", "text")
    val composed = df.filter(
      TextAnalysis.tokenCount(col("text")) >= 5 &&
      TextAnalysis.qualityScore(col("text")) >= 300 &&
      TextAnalysis.langId(col("text")) === "en")
      .select("doc_id").as[Long].collect().toSet
    val fused = df.filter(graft.functions.CurationGate(col("text"),
      TextAnalysis.stopwords, minTokens = 5, minQuality = 300,
      wantLang = "en"))
      .select("doc_id").as[Long].collect().toSet
    assert(fused === composed)
    assert(fused.nonEmpty, "degenerate test: no row passed either form")
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq((1L, "ab 12 c!")).toDF("doc_id", "text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishCount(col("text")).as("bp")).first()
    assert(got.getInt(0) === 3 && got.getInt(1) === 4)
  }

  test("fingerprint: equal for equal text, char-8-gram sensitive") {
    val df = Seq((1L, "abcdefghijklmnop"), (2L, "abcdefghijklmnop"),
      (3L, "abcdefghijklmnoX")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp")).as[(Long, Long)]
      .collect().toMap
    assert(fp(1L) === fp(2L))
  }

  test("saltedJoin equals plain join (inner + left)") {
    val big = Seq(("k1", 1), ("k1", 2), ("k1", 3), ("k2", 4), ("k3", 5))
      .toDF("k", "v")
    val small = Seq(("k1", "x"), ("k2", "y")).toDF("k", "s")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "v", "s").collect().map(_.toSeq).toSet
      val salted = Transforms.saltedJoin(big, small, "k", 4, jt)
        .select("k", "v", "s").collect().map(_.toSeq).toSet
      assert(salted === plain, s"joinType=$jt")
    }
  }

  test("sessionize: gap splits sessions, per-key numbering") {
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 1.0),
      (1L, 2L, "2024-01-01 00:10:00", 1.0),
      (1L, 3L, "2024-01-01 02:00:00", 1.0), // > 30min gap → new session
      (2L, 4L, "2024-01-01 00:00:00", 1.0))
      .toDF("user_id", "event_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = graft.operators.Sessionize
      .sessionStats(ev, "user_id", "ts", "event_id", 1800)
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("blockedEditDistance: pairs only within blocks, threshold + id order") {
    import graft.operators.Dedup
    val recs = Seq(
      (1L, "A", "kitten"), (2L, "A", "sitten"), (3L, "A", "zzzzzzzzzz"),
      (4L, "B", "kitten"), // same text as 1 but different block → no pair
      (5L, "B", "kitte")).toDF("id", "blk", "s")
    val got = Dedup.blockedEditDistance(recs, "blk", "s", "id", maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    // within A: (1,2) dist 1; (1,3)/(2,3) dist 10 > 3 dropped.
    // within B: (4,5) dist 1. across blocks: nothing, ever.
    assert(got === Set((1L, 2L, 1L), (4L, 5L, 1L)))
    // a < b canonical ordering: no (2,1) mirror, no self-pairs
    assert(got.forall { case (a, b, _) => a < b })
  }

  test("sortedNeighborPairs: window-bounded, block-bounded, forward-once") {
    import graft.operators.Dedup
    val recs = Seq((1L, "apple"), (2L, "applf"), (3L, "apzzz"),
      (4L, "beta"), (5L, "betb")).toDF("id", "s")
    val got = Dedup.sortedNeighborPairs(recs,
        substring(col("s"), 1, 1), col("s"), "s", "id",
        window = 2, maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    // block 'a' sort: apple(1), applf(2), apzzz(3) → (1,2) d1 kept;
    // (2,3)/(1,3) exceed maxDist. block 'b': beta(4), betb(5) → d1 kept.
    // cross-block (3,4) is never a candidate.
    assert(got === Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("distinct_approx: HLL estimate within 5% of exact per group") {
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("distinct_approx")(spark, dir)
      .as[(String, Long)].collect().toMap
    val exact = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    for ((k, est) <- approx) {
      val ex = exact(k).toDouble
      assert(math.abs(est - ex) / ex <= 0.05,
        s"$k: estimate $est vs exact $ex exceeds 5%")
    }
  }

  test("scdType2: abutting half-open intervals, open head is current") {
    // key 1's versions arrive out of order — the window order, not row
    // order, must decide the chain; key 2 is a singleton (current from day
    // one).
    val log = Seq((1L, 10L, "2020-01-01"), (1L, 11L, "2020-03-01"),
      (1L, 12L, "2020-02-01"), (2L, 20L, "2021-05-05")).toDF("k", "ver", "d")
    val out = Transforms
      .scdType2(log, Seq(col("k")), Seq(col("d"), col("ver")), col("d"))
      .select("k", "ver", "eff_from", "eff_to", "is_current")
      .as[(Long, Long, String, Option[String], Long)].collect().toSet
    assert(out === Set(
      (1L, 10L, "2020-01-01", Some("2020-02-01"), 0L),
      (1L, 12L, "2020-02-01", Some("2020-03-01"), 0L),
      (1L, 11L, "2020-03-01", None, 1L),
      (2L, 20L, "2021-05-05", None, 1L)))
  }

  test("winsorizedSum: tails clamp to the exact percentile band") {
    // 0..9 plus outlier 1000: n=11, p10 rank index = 1 → lo = 1,
    // p90 index = 9 → hi = 9. Clamp maps 0→1 and 1000→9; middle unchanged.
    val df = ((0L to 9L) :+ 1000L).map(("g", _)).toDF("grp", "v")
    val out = Transforms.winsorizedSum(df, "grp", "v", 0.10, 0.90)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("g", 11L, 1L + (1L to 9L).sum + 9L)))
  }

  test("zValue8: known morton value, invertible, inputs masked to 8 bits") {
    def z(x: Long, y: Long): Long = Seq((x, y)).toDF("x", "y")
      .select(Transforms.zValue8(col("x"), col("y"))).as[Long].head()
    // x=5 (101b) → even bits 10001b=17; y=3 (011b) → odd bits 1010b=10
    assert(z(5L, 3L) === 27L)
    // deinterleave recovers the inputs across the domain's corners/edges
    for ((x, y) <- Seq((0L, 0L), (255L, 255L), (170L, 85L), (1L, 128L),
        (200L, 7L))) {
      val v = z(x, y)
      var (rx, ry) = (0L, 0L)
      for (i <- 0 until 8) {
        rx |= ((v >> (2 * i)) & 1L) << i
        ry |= ((v >> (2 * i + 1)) & 1L) << i
      }
      assert((rx, ry) === (x, y), s"z($x,$y)=$v")
    }
    // out-of-range inputs wrap to their low byte, never overflow the curve
    assert(z(256L, 0L) === z(0L, 0L) && z(511L, 3L) === z(255L, 3L))
  }

  test("hilbertD8: matches reference xy2d; consecutive d are grid neighbors") {
    // reference: the classic iterative xy2d (Wikipedia/Hamilton form)
    def ref(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0 & 255L, y0 & 255L, 0L)
      var s = 128L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 255L - x; y = 255L - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val rnd = new scala.util.Random(11)
    val pts = (for (_ <- 1 to 256)
        yield (rnd.nextLong(256), rnd.nextLong(256))) ++
      (for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)) ++
      Seq((0L, 0L), (255L, 255L), (255L, 0L), (0L, 255L), (300L, 7L))
    val got = Transforms.hilbertD8(pts.toDF("x", "y"),
        col("x"), col("y"), "d")
      .select(col("x"), col("y"), col("d"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, d) => assert(d === ref(x, y), s"($x,$y)") }
    // the Hilbert invariant Morton lacks: walking d by 1 always moves to
    // a grid NEIGHBOR (|Δx| + |Δy| = 1) — checked via the reference's
    // inverse on a stretch of the curve.
    def inv(t0: Long): (Long, Long) = {
      var (x, y, t) = (0L, 0L, t0)
      var s = 1L
      while (s < 256) {
        val rx = (t / 2) % 2
        val ry = if (rx == 1L) 1L - (t % 2) else t % 2
        // un-rotate at this scale
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val w = x; x = y; y = w
        }
        x += s * rx; y += s * ry; t /= 4; s *= 2
      }
      (x, y)
    }
    for (d <- 1000L to 1256L) {
      val (x1, y1) = inv(d - 1); val (x2, y2) = inv(d)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"d=$d")
      assert(ref(x2, y2) === d) // inverse really is ref's inverse
    }
  }

  test("modularityStats: two triangles + bridge = the textbook Q=70/196") {
    import graft.operators.GraphAlgos
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("s", "d")
    val lab = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "lab")
    val got = GraphAlgos.modularityStats(e, "s", "d", lab)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // m=7; each community: 3 nodes, 3 internal edges, degree mass 7
    // (2+2+3); contrib = 4·7·3 − 49 = 35; q_den = 196 → Q = 70/196.
    assert(got(10L) === ((10L, 3L, 3L, 7L, 7L, 35L, 196L)))
    assert(got(20L) === ((20L, 3L, 3L, 7L, 7L, 35L, 196L)))
    // duplicate/reversed input edges collapse; a community with no
    // internal edge reports e_in = 0, not a dropped row
    val e2 = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("s", "d")
    val lab2 = Seq((1L, 10L), (2L, 10L), (3L, 30L)).toDF("id", "lab")
    val got2 = GraphAlgos.modularityStats(e2, "s", "d", lab2)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // m=2: comm 10 = {1,2}: e_in=1, d=3; comm 30 = {3}: e_in=0, d=1
    assert(got2(10L) === ((10L, 2L, 1L, 3L, 2L, 4L * 2L * 1L - 9L, 16L)))
    assert(got2(30L) === ((30L, 1L, 0L, 1L, 2L, -1L, 16L)))
  }

  test("lineDedup: cross-doc lines drop, intra-doc repeats stay, order kept") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 3 lines at width 4; first is shared
      (2L, "a b c d x y z w"),
      (3L, "q r s t"),
      (4L, "a b c d"),             // all-boilerplate doc → empty rebuild
      (5L, "m n o p m n o p")      // same line TWICE in one doc: df=1
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineDedup(docs, "text", "doc_id",
        width = 4, maxDocFreq = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 2L, "e f g h i j")))
    assert(got(2L) === ((2L, 1L, "x y z w")))
    assert(got(3L) === ((1L, 1L, "q r s t")))
    assert(got(4L) === ((1L, 0L, "")))
    // doc frequency, not occurrence count: an intra-doc repeat is df=1
    assert(got(5L) === ((2L, 2L, "m n o p m n o p")))
  }

  test("normalizeText: case, punctuation, whitespace variants collapse") {
    val out = Seq("Hello,  World!!", "hello world", "  HELLO--world  ",
      "a.b,c").toDF("t")
      .select(TextAnalysis.normalizeText(col("t"))).as[String].collect()
    assert(out(0) === "hello world")
    assert(out(1) === "hello world")
    assert(out(2) === "hello world")
    assert(out(3) === "a b c")
  }

  test("clusterRepresentatives: longest member wins, ties to smallest id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "cluster_id")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 4L), (8L, 4L),
      (9L, 100L)).toDF("doc_id", "len")
    val out = Dedup.clusterRepresentatives(clusters, docs, "doc_id", col("len"))
      .as[(Long, Long, Long)].collect().toSet
    // cluster 1: 2 and 3 tie on len 9 → min id 2; cluster 7: tie → 7;
    // doc 9 has no near-dup → not represented at all.
    assert(out === Set((1L, 2L, 3L), (7L, 7L, 2L)))
  }

  test("quantiles_approx: each quartile within 1% of the exact percentile") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("quantiles_approx")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.25)") * 100)
        .cast("long").as("q1"),
        round(expr("percentile(l_extendedprice, 0.5)") * 100)
          .cast("long").as("q2"),
        round(expr("percentile(l_extendedprice, 0.75)") * 100)
          .cast("long").as("q3"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
    assert(approx.keySet === exact.keySet)
    for (k <- approx.keys; (est, ex) <- approx(k).zip(exact(k))) {
      assert(math.abs(est - ex).toDouble / ex <= 0.01,
        s"$k: approx $est vs exact $ex exceeds 1%")
    }
  }

  test("freq_approx: sketch counts within 1% of exact, top-10 contained") {
    val dir = "/root/testdata/sf0.001"
    val approx = SparkEntry.queries("freq_approx")(spark, dir)
      .as[(String, Long)].collect().toMap
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextAnalysis.wsTokens(lower(trim(col("text"))))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(approx.nonEmpty)
    for ((w, n) <- approx) {
      val ex = exact(w)
      assert(math.abs(n - ex).toDouble / ex <= 0.01,
        s"$w: sketch $n vs exact $ex exceeds 1%")
    }
    val top10 = exact.toSeq.sortBy { case (w, n) => (-n, w) }
      .take(10).map(_._1).toSet
    assert(top10.subsetOf(approx.keySet),
      s"missing exact top-10 items: ${top10 -- approx.keySet}")
  }

  test("funnelStages: earliest-after-previous per stage, abandonment nulls") {
    import graft.operators.EventAnalytics
    // user 1: the click at t=5 precedes the first view (t=10) so it can't
    // advance the funnel; the t=20 click does. user 2 purchases without
    // ever clicking → stuck at stage 1. user 3 never views → absent.
    val ev = Seq((1L, "view", 10L), (1L, "click", 5L), (1L, "click", 20L),
      (1L, "purchase", 30L), (2L, "view", 10L), (2L, "purchase", 15L),
      (3L, "click", 5L)).toDF("user_id", "event_type", "t")
    val out = EventAnalytics.funnelStages(ev, "user_id", "event_type", "t",
      Seq("view", "click", "purchase"))
      .select("user_id", "t_1", "t_2", "t_3", "stage")
      .as[(Long, Option[Long], Option[Long], Option[Long], Long)]
      .collect().toSet
    assert(out === Set(
      (1L, Some(10L), Some(20L), Some(30L), 3L),
      (2L, Some(10L), None, None, 1L)))
  }

  test("retentionCohorts: first-day cohorts, distinct entities per age") {
    import graft.operators.EventAnalytics
    val ev = Seq((1L, 0L), (1L, 0L), (1L, 2L), (2L, 0L), (2L, 1L), (3L, 1L))
      .toDF("user_id", "day")
    val out = EventAnalytics.retentionCohorts(ev, "user_id", "day")
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L)))
  }

  test("debounce: previous-row reference, exact-gap boundary survives") {
    import graft.operators.EventAnalytics
    val ev = Seq((1L, "u", "c", 0L), (2L, "u", "c", 100L),
      (3L, "u", "c", 300L), (4L, "u", "c", 650L), (5L, "u", "d", 50L),
      (6L, "u", "e", 0L), (7L, "u", "e", 300L))
      .toDF("event_id", "u", "et", "t")
    val out = EventAnalytics.debounce(ev, Seq(col("u"), col("et")),
      Seq(col("t"), col("event_id")), "t", minGap = 300L)
      .select("event_id").as[Long].collect().toSet
    // (u,c): t=0 kept; t=100 (gap 100) dropped; t=300 dropped — the gap is
    // measured to the previous ROW (t=100), not the previous survivor;
    // t=650 kept (gap 350). Exactly-minGap gaps survive (>=): ids 6, 7.
    assert(out === Set(1L, 4L, 5L, 6L, 7L))
  }

  test("labelPropagation: disjoint triangles converge to their min label") {
    import graft.operators.GraphAlgos
    // two K3s, fed with duplicate/reversed edges and a self-loop — the
    // canonicalization must make those invisible. Sync LPA on a K3:
    // round 1 → {1→2, 2→1, 3→1}, round 2 → all 1, stable after.
    val k3a = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 1L))
    val k3b = Seq((10L, 11L), (11L, 12L), (12L, 10L), (10L, 11L))
    val out = GraphAlgos.labelPropagation(
      (k3a ++ k3b).toDF("s", "d"), "s", "d", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("sigmaOutlierCensus: integer 3σ flag, no variance-eating-itself FP") {
    // 20 zeros + one 100: σ ≈ 21.3, the spike sits ≈4.5σ out → flagged;
    // the zeros are within 1σ. A symmetric group has no outliers at all
    // (every value is exactly 1σ from the mean).
    val df = ((1 to 20).map(_ => ("a", 0L)) :+ (("a", 100L))) ++
      Seq(("b", 10L), ("b", 30L))
    val got = Transforms.sigmaOutlierCensus(df.toDF("g", "v"), "g", "v", 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((1L, 21L)), "b" -> ((0L, 2L))))
  }

  test("madOutlierCensus: spike can't mask itself; mad4 stays integer") {
    import graft.operators.Transforms
    // 20 zeros + one 100: median 0, MAD 0 → ANY deviation flags (the
    // robust census catches the spike that inflated σ). {10,30}: median
    // 20, deviations both 20, MAD 20 → 20 < 3·20, nothing flagged —
    // and every intermediate (med2=40, mad4=40) is an exact integer
    // despite the even-count interpolation.
    val df = ((1 to 20).map(_ => ("a", 0L)) :+ (("a", 100L))) ++
      Seq(("b", 10L), ("b", 30L))
    val got = Transforms.madOutlierCensus(df.toDF("g", "v"), "g", "v", 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((1L, 21L)), "b" -> ((0L, 2L))))
  }

  test("transitionMatrix: per-entity lag pairs, integer-permille shares") {
    import graft.operators.EventAnalytics
    // u1: A,B,A,C → A→B, B→A, A→C; u2: B,B → B→B. No cross-user pair;
    // prev A splits 500/500, prev B splits 500/500 across {A, B}.
    val e = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "A", 3L), (1L, "C", 4L),
      (2L, "B", 1L), (2L, "B", 2L)).toDF("u", "et", "t")
    val got = EventAnalytics.transitionMatrix(e, "u", "et", Seq(col("t")))
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      ("A", "B") -> ((1L, 500L)), ("A", "C") -> ((1L, 500L)),
      ("B", "A") -> ((1L, 500L)), ("B", "B") -> ((1L, 500L))))
  }

  test("timeWeightedAvg: span-weighted, last observation dropped") {
    import graft.operators.EventAnalytics
    // spans: v=10 held 10 ticks, v=30 held 20 ticks → (100+600)/30 = 23
    // (floor). The final v=99 has no span and must not contribute.
    val e = Seq((1L, 0L, 10L, 1L), (1L, 10L, 30L, 2L), (1L, 30L, 99L, 3L))
      .toDF("u", "ts", "v", "id")
    val got = EventAnalytics.timeWeightedAvg(e, "u", "ts", "v",
      Seq(col("id"))).as[(Long, Long, Long)].collect().toList
    assert(got === List((1L, 23L, 2L)))
  }

  test("maxConcurrency: half-open intervals, closes before opens on ties") {
    import graft.operators.EventAnalytics
    // [0,10) [5,15) [10,20): peak 2 during [5,10); at t=10 the first
    // interval's close processes before the third's open, so back-to-back
    // never reads 3. Key "y": nested [0,30) [5,25) [10,20) → 3.
    val iv = Seq(("x", 0L, 10L), ("x", 5L, 15L), ("x", 10L, 20L),
      ("y", 0L, 30L), ("y", 5L, 25L), ("y", 10L, 20L))
      .toDF("k", "t0", "t1")
    val got = EventAnalytics.maxConcurrency(iv, "k", "t0", "t1")
      .as[(String, Long)].collect().toMap
    assert(got === Map("x" -> 2L, "y" -> 3L))
  }

  test("orderedPrefixSum: matches single-partition running total") {
    import graft.operators.Transforms
    // keys 1..100 with value=key, coarse bucket DIV 7: inclusive running
    // total must be exactly k(k+1)/2 at every row — bucket offsets plus
    // within-bucket sums reassemble the global scan.
    val df = (1L to 100L).map(k => (k, k)).toDF("k", "v")
    val got = Transforms.orderedPrefixSum(df, expr("k DIV 7"),
      Seq(col("k")), "v", "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert((1L to 100L).forall(k => got(k) == k * (k + 1) / 2))
  }

  test("compactionBins: greedy first-fit by start offset, bins near target") {
    import graft.operators.Transforms
    // sizes 60,60,60 with target 100: starts at 0,60,120 → bins 0,0,1 —
    // a bin may overflow the target by one file but never starts past it.
    val f = Seq((1L, 60L), (2L, 60L), (3L, 60L)).toDF("k", "bytes")
    val got = Transforms.compactionBins(f, "k", "bytes",
      expr("k DIV 2"), target = 100L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(0L -> ((2L, 120L)), 1L -> ((1L, 60L))))
  }

  test("zoneMapPrune: zones outside the predicate range are skippable") {
    import graft.operators.Transforms
    // zone 0 holds 1..10, zone 1 holds 11..20, zone 2 holds 21..30;
    // predicate [12, 18] keeps only zone 1 → 2 zones / 20 rows skipped.
    val df = (1L to 30L).map(v => ((v - 1) / 10, v)).toDF("z", "v")
    val got = Transforms.zoneMapPrune(df, col("z"), "v", 12L, 18L)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got === List((3L, 2L, 20L, 30L)))
  }

  test("shortestPaths: bounded relaxation, parallel edges, unreachable") {
    import graft.operators.GraphAlgos
    // 1→2 twice (w5 and w10: keep-cheapest), 1→3 (w1), 3→2 (w1), 2→4
    // (w1); node 9 only reaches itself — backwards edge 9→1 must not
    // make 9 reachable FROM the source. Source = {1}.
    val e = Seq((1L, 2L, 5L), (1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 1L), (9L, 1L, 1L)).toDF("s", "d", "w")
    val src = Seq(1L).toDF("id")
    def run(rounds: Int): Map[Long, Long] =
      GraphAlgos.shortestPaths(e, "s", "d", "w", src, "id", rounds)
        .as[(Long, Long)].collect().toMap
    // round 2: direct 1→2 (5) already relaxed to 1→3→2 (2); 4 only via
    // the 5-cost prefix so far. Round 3 finds the 3-edge path to 4.
    assert(run(2) === Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 6L))
    assert(run(3) === Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 3L))
  }

  test("ohlcBars: open/close follow the (t, id) total order through ties") {
    import graft.operators.EventAnalytics
    // one bucket: two rows at t=1 — the id breaks the tie for open;
    // close is the latest (t=2). high/low are order-free.
    val ev = Seq(("a", 0L, 1L, 1L, 10L), ("a", 0L, 1L, 2L, 30L),
      ("a", 0L, 2L, 3L, 5L), ("b", 1L, 9L, 4L, 7L))
      .toDF("k", "bkt", "t", "id", "v")
    val got = EventAnalytics.ohlcBars(ev, "k", col("bkt").as("bucket"),
        "v", Seq(col("t"), col("id")))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got === Map(("a", 0L) -> ((10L, 30L, 5L, 5L, 3L)),
      ("b", 1L) -> ((7L, 7L, 7L, 7L, 1L))))
  }

  test("distributionEntropy: uniform=ln k, single-category=0, 3:1 split") {
    import graft.operators.EventAnalytics
    val df = (Seq.fill(1)(("u1", "a")) ++ Seq(("u1", "b"), ("u1", "c"),
        ("u1", "d"))) ++ Seq.fill(5)(("u2", "x")) ++
      (Seq.fill(3)(("u3", "a")) :+ (("u3", "b")))
    val got = EventAnalytics.distributionEntropy(df.toDF("u", "cat"),
        "u", "cat")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // u1: uniform over 4 → ln 4 = 1.3863 → 1386; u2: one category → 0;
    // u3: −(¾·ln¾ + ¼·ln¼) = 0.5623 → 562 (quantized-ln arithmetic:
    // (287682·3 + 1386294) / 4000 rounds to 562).
    assert(got === Map("u1" -> ((1386L, 4L)), "u2" -> ((0L, 1L)),
      "u3" -> ((562L, 2L))))
  }

  test("seasonalAnomaly: spike vs same-phase mean, integer cross-multiply") {
    import graft.operators.EventAnalytics
    // key a, phase 0: day counts (1,1,5) → np=3 tot=7; spike 5·3=15 >
    // 2·7=14 flags exactly one bucket. phase 1: (2,2) → 2·2=4 !> 2·4 →
    // none. Built as raw event rows so the first collapse is exercised.
    val rows = Seq.fill(1)(("a", 1L, 0L)) ++ Seq.fill(1)(("a", 2L, 0L)) ++
      Seq.fill(5)(("a", 3L, 0L)) ++ Seq.fill(2)(("a", 1L, 1L)) ++
      Seq.fill(2)(("a", 2L, 1L))
    val got = EventAnalytics.seasonalAnomaly(rows.toDF("k", "day", "hod"),
        "k", col("day"), col("hod"), factor = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got === Map(("a", 0L) -> ((3L, 7L, 1L)),
      ("a", 1L) -> ((2L, 4L, 0L))))
  }

  test("reciprocalTopK: hub points don't survive one-directional pull") {
    import graft.operators.Similarity
    // axis-aligned toy: v1≈v2 (mutual top-1), v3 orthogonal-ish closer
    // to v1 than to anything — with k=1, v3 picks v1 but v1 picks v2,
    // so (1,3) must NOT appear; (1,2) must.
    val vs = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.99, 0.14, 0.0)),
      (3L, Seq(0.6, -0.8, 0.0))).toDF("id", "vec")
    val got = Similarity.reciprocalTopK(vs, 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
    // k=2 admits the (1,3) pair: 3's top-2 is {1,2}... and 1's is {2,3}
    val got2 = Similarity.reciprocalTopK(vs, 2)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got2 === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("paretoFront2D: strict dominance, ties survive, buckets don't leak") {
    import graft.operators.Transforms
    // frontier: (10,1) (7,5) (5,9); dominated: (7,4) by (7,5); (6,5) by
    // (7,5); (5,9) duplicated — BOTH copies survive (equal points tie).
    // bucket width 3 on -x splits {10} | {7,7,6} | {5,5} — the offset
    // chain must carry the max across buckets.
    val pts = Seq((1L, 10L, 1L), (2L, 7L, 5L), (3L, 7L, 4L), (4L, 6L, 5L),
      (5L, 5L, 9L), (6L, 5L, 9L))
      .toDF("id", "x", "y")
    val got = Transforms.paretoFront2D(pts, "x", "y",
        expr("-(x DIV 3)"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 5L, 6L))
  }

  test("maintainAggState: inserts, retractions, empty groups drop") {
    import graft.operators.Reconcile
    val state = Seq(("a", 2L, 30L), ("b", 1L, 7L)).toDF("k", "n", "s")
    // a: +1 of 5 → (3, 35); b: −1 of 7 → (0, 0) → dropped;
    // c: fresh inserts only → (2, 9)
    val delta = Seq(("a", 1L, 5L), ("b", -1L, 7L), ("c", 1L, 4L),
      ("c", 1L, 5L)).toDF("k", "op", "v")
    val got = Reconcile.maintainAggState(state, "k", "n", "s",
        delta, "op", "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((3L, 35L)), "c" -> ((2L, 9L))))
  }

  test("pcmWindowEnergy: byte-level decode matches the generator formula") {
    import graft.operators.Multimodal
    val assets = Seq((42L, 100L)).toDF("id", "n")
      .select(col("id"),
        Multimodal.wavPcmContent(col("id"), col("n")).as("content"))
    // the general chunk walk and the canonical-layout fast path must
    // agree on the payload size (100 samples × 2 B / blockAlign 4 = 50
    // frames per HeaderProbe's stereo accounting)
    val bytes = assets.select("content").as[Array[Byte]].first()
    assert(bytes.length === 44 + 200)
    assert(graft.operators.HeaderProbe.wav(bytes).map(_.nFrames) === Some(50))
    val got = Multimodal.pcmWindowEnergy(assets, "id", "content", 64)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    // expected energies straight from the formula, per 64-sample frame
    def s(i: Long): Long = {
      val raw = (42L * 31 + i * 2654435761L) % 65536
      if (raw >= 32768) raw - 65536 else raw
    }
    val exp = (0L until 100L).groupBy(_ / 64).map { case (f, is) =>
      f -> ((is.size.toLong, is.map(i => s(i) * s(i)).sum))
    }
    assert(got === exp)
  }

  test("slidingDistinct: trailing window, anchors only at active buckets") {
    import graft.operators.EventAnalytics
    // key a: u1@h0 u1@h1 u2@h1 u1@h5 — anchors {0,1,5}; window [h-2,h]:
    // W0={u1}, W1={u1,u2}, W5={u1}. h2..h4 have no data → no anchor rows
    // even though u1@h1 is still inside W3's range. Duplicate events in
    // the same bucket collapse.
    val df = Seq(("a", 0L, 10L), ("a", 1L, 10L), ("a", 1L, 10L),
      ("a", 1L, 20L), ("a", 5L, 10L), ("b", 7L, 30L))
      .toDF("k", "h", "u")
    val got = EventAnalytics.slidingDistinct(df, "k", "h", "u", 2)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map(("a", 0L) -> 1L, ("a", 1L) -> 2L, ("a", 5L) -> 1L,
      ("b", 7L) -> 1L))
  }

  test("fkAudit: orphan and null FKs counted, clean relations report zero") {
    import graft.operators.Transforms
    val child = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Transforms.fkAudit(Seq(("c.fk", child, "fk", parent, "pk")))
      .as[(String, Long, Long)].collect().toList
    // 99 is an orphan; the null FK resolves to nothing → also an orphan
    assert(got === List(("c.fk", 4L, 2L)))
  }

  test("degreeHistogram: duplicate edges collapse before the degree count") {
    import graft.operators.GraphAlgos
    // 1→{2,3}, 2→{3}, duplicated — degrees {1:2, 2:1} → hist {2:1, 1:1}
    val e = Seq((1L, 2L), (1L, 3L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val got = GraphAlgos.degreeHistogram(e, "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 1L, 1L -> 1L))
  }

  test("jaroWinkler: published vectors, library conventions, codegen path") {
    import graft.functions.JaroWinkler.computeStr
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    // Winkler's canonical examples
    assert(close(computeStr("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(close(computeStr("DWAYNE", "DUANE"), 0.84))
    assert(close(computeStr("DIXON", "DICKSONX"), 0.8133333333333332))
    // library conventions pinned against DuckDB's implementation:
    // empty → 0 (even both-empty); no boost at jaro ≤ 0.7; window-0
    // short strings can't cross-match; transposition half FLOORS
    assert(computeStr("", "") === 0.0)
    assert(computeStr("a", "") === 0.0)
    assert(computeStr("xy", "yx") === 0.0)
    assert(close(computeStr("abcdef", "abczzzzzz"), 0.6111111111111112))
    assert(close(computeStr("abcxxxx", "bcaxxxx"), 0.9523809523809524))
    // prefix caps at 4 even for longer shared runs
    assert(close(computeStr("aaaaaab", "aaaaaac"),
      { val j = (6.0 / 7 + 6.0 / 7 + 1.0) / 3; j + 4 * 0.1 * (1 - j) }))
    // the Column API goes through codegen and matches the static path
    val df = Seq(("MARTHA", "MARHTA"), ("prefix", "preboot"))
      .toDF("a", "b")
      .select(graft.functions.JaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.as[Double].collect()
    assert(close(got(0), 0.9611111111111111))
    assert(close(got(1), computeStr("prefix", "preboot")))
  }

  test("bpeMerges: Sennrich corpus — freq weighting, ties, merged symbols") {
    // words: low×3, lower×2, newest×1.
    // iter1: (l,o)=5 ties (o,w)=5 → lexicographic px picks (l,o).
    // iter2: merged 'lo' participates: (lo,w)=5 wins.
    // iter3: (low,e)=2 ties (e,r)=2 → 'e' < 'low' picks (e,r).
    val docs = Seq((1L, "low low low"), (2L, "lower lower"),
      (3L, "newest")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, "text", iters = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toList
    assert(got === List((1L, "l o", 5L), (2L, "lo w", 5L),
      (3L, "e r", 2L)))
  }

  test("sourceKeyness: lift ranks domain terms, floor kills hapax") {
    // source A: 'spark' 5×, shared filler 'the' 5×; source B: 'the' 10×
    // plus hapax 'rare'. Corpus N=21, A n_s=10, B n_s=11.
    // A/'spark': lift = 5·21·1000 / (5·10) = 2100. A/'the': 5·21·1000 /
    // (15·10) = 700. B/'the': 10·21·1000/(15·11) = 1272. 'rare' tf 1 < 5
    // → floored out even though its lift would top the list.
    val docs = Seq(
      (1L, ("spark " * 5 + "the " * 5).trim, "A"),
      (2L, ("the " * 10 + "rare").trim, "B")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceKeyness(docs, "text", "source",
        k = 5, minTf = 5)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(("A", "spark") -> ((5L, 2100L)),
      ("A", "the") -> ((5L, 700L)), ("B", "the") -> ((10L, 1272L))))
  }

  test("mutualInformation: zero for independence, H(X) for identity") {
    import graft.operators.EventAnalytics
    // independent: every (x, y) cell equally likely → MI = 0
    val ind = (for (x <- Seq("a", "b"); y <- Seq(0L, 1L); _ <- 1 to 5)
      yield (x, y)).toDF("x", "y")
    val mi0 = EventAnalytics.mutualInformation(ind, "x", "y")
      .as[(Long, Long, Long)].collect().head
    assert(mi0 === ((0L, 4L, 20L)))
    // deterministic y = f(x), uniform over 4 values → MI = H = ln 4
    val det = (for (x <- Seq("a", "b", "c", "d"); _ <- 1 to 3)
      yield (x, x.hashCode.toLong)).toDF("x", "y")
    val mi1 = EventAnalytics.mutualInformation(det, "x", "y")
      .as[(Long, Long, Long)].collect().head
    assert(mi1 === ((1386L, 4L, 12L)))
  }

  test("hits: two un-normalized rounds, hand-checked, missing sides zero") {
    import graft.operators.GraphAlgos
    // 1→3, 2→3, 3→4 (duplicated — distinct inside). Round 1:
    // a = {3:2, 4:1}; h = {1:2, 2:2, 3:1, 4:0}. Round 2: a = {3:4, 4:1};
    // h = {1:4, 2:4, 3:1, 4:0}. Pure sinks/sources hold exact zeros.
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("s", "d")
    val got = GraphAlgos.hits(e, "s", "d", rounds = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((4L, 0L)), 2L -> ((4L, 0L)),
      3L -> ((1L, 4L)), 4L -> ((0L, 1L))))
  }

  test("containmentPairs: embedded quote scores 1000 where Jaccard misses") {
    // doc 2 is a verbatim 6-word quote inside doc 1's 40 words:
    // containment(2→1) = 1000 (both its shingles appear in doc 1) but
    // Jaccard = 2/36 ≈ 56 permille — far under any dedup threshold.
    val quote = "the quick brown fox jumps high"
    val long = (quote + " " + (1 to 34).map(i => s"w$i").mkString(" "))
    val docs = Seq((1L, long), (2L, quote), (3L, "unrelated text entirely here now"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id", n = 5,
        thresholdPermille = 800)
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got === List((1L, 2L, 56L, 1000L)))
    val jacc = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 5,
      thresholdPermille = 100).count()
    assert(jacc === 0L)
  }

  test("imageAHash: BMP pixel round-trip — padding, bottom-up rows, bits") {
    // w=9 forces a 1-byte row pad (27+1); h=6 exercises the bottom-up
    // offset math. The expected hash is recomputed here from the
    // generator formula, independently of the SQL expressions.
    val (seed, w, h) = (42L, 9L, 6L)
    val assets = Seq((seed, w, h)).toDF("id", "w", "h")
      .select(col("id"),
        Multimodal.bmpPixelContent(col("id"), col("w"), col("h"))
          .as("content"))
    val bytes = assets.select("content").as[Array[Byte]].first()
    val rs = ((3 * w + 3) / 4) * 4
    assert(bytes.length === 54 + rs * h)
    assert(graft.operators.HeaderProbe.bmp(bytes).map(p =>
      (p.width, p.height)) === Some((w.toInt, h.toInt)))
    // independent reimplementation from the generator
    def v(i: Long): Long = (seed * 31 + i * 2654435761L) % 256
    val lumas = for (cell <- 0L until 64L) yield {
      val (cx, cy) = (cell % 8, cell / 8)
      val px = ((2 * cx + 1) * w) / 16
      val py = ((2 * cy + 1) * h) / 16
      val k = (h - 1 - py) * rs + 3 * px
      (299 * v(k + 2) + 587 * v(k + 1) + 114 * v(k)) / 1000
    }
    val tot = lumas.sum
    val expHex = (0 until 8).map { cy =>
      val rb = (0 until 8).map { cx =>
        if (lumas((cy * 8 + cx).toInt) * 64 > tot) 1L << cx else 0L
      }.sum
      f"$rb%02X"
    }.mkString
    val got = Multimodal.imageAHash(assets, "id", "content")
      .as[(Long, Long, Long, String)].collect().head
    assert(got === ((seed, w, h, expHex)))
    // pad bytes really are zero where they should be
    assert(bytes(54 + 27) === 0.toByte)
  }

  test("ahashHammingPairs: pigeonhole recall, both rejection modes") {
    // 1: base; 2: one bit flipped (d=1, found via 7 clean bands);
    // 3: 5 bits flipped inside ONE band (d=5 — other bands clean, found);
    // 4: 8 bits flipped ONE PER BAND (d=8: no clean band — correctly
    //    not even a candidate);
    // 5: 8 bits flipped in one band (candidate via 7 clean bands, but
    //    verify rejects d=8).
    val base = "00FF00FF00FF00FF"
    val hs = Seq(
      (1L, base),
      (2L, "01FF00FF00FF00FF"),
      (3L, "1FFF00FF00FF00FF"),
      (4L, "01FE01FE01FE01FE"),
      (5L, "FFFF00FF00FF00FF")).toDF("id", "hx")
    val got = Multimodal.ahashHammingPairs(hs, "id", "hx", maxDist = 7)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) === 1L)
    assert(got((1L, 3L)) === 5L)
    assert(!got.contains((1L, 4L)) && !got.contains((1L, 5L)))
    assert(got((2L, 3L)) === 4L) // 01 vs 1F = 4 bits, same band
  }

  test("trendSlope: exact sufficient stats, degenerate spread yields null") {
    import graft.operators.EventAnalytics
    val df = Seq(("a", 100L, 0L), ("a", 101L, 10L), ("a", 102L, 20L),
      ("b", 5L, 7L), ("b", 5L, 9L), ("c", 0L, 5L), ("c", 10L, 5L))
      .toDF("k", "x", "y")
    val got = EventAnalytics.trendSlope(df, "k", "x", "y")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "a" -> ((3L, Some(10000000L))), // slope 10/unit → 10M micro
      "b" -> ((2L, None)),            // zero x spread → null
      "c" -> ((2L, Some(0L)))))       // flat
  }

  test("theilSenSlope: pairwise-slope lower median, outlier-robust vs OLS") {
    import graft.operators.EventAnalytics
    // key a: y = 2x exactly except one wild outlier at x=3 (y=1000).
    // pairwise slopes (micro): the outlier contaminates only 3 of 6
    // pairs, so the median stays 2e6; OLS on the same data does not.
    val df = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L),
      ("a", 3L, 1000L),
      ("b", 0L, 5L), ("b", 10L, 5L), // flat pair
      ("c", 7L, 9L)) // singleton: no pairs, absent from output
      .toDF("k", "x", "y")
    val got = EventAnalytics.theilSenSlope(df, "k", "x", "y")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // a: slopes = 2,2,2 (clean pairs) and 333.33e6, 499e6, 996e6-ish
    //   (outlier pairs) → sorted lower median (rank 3 of 6) = 2e6
    assert(got("a")._1 === 6L)
    assert(got("a")._2 === 2000000L)
    assert(got("b") === ((1L, 0L)))
    assert(!got.contains("c"))
    val ols = EventAnalytics.trendSlope(df.filter(col("k") === "a"),
      "k", "x", "y").as[(String, Long, Option[Long])].collect().head._3.get
    assert(math.abs(ols) > 100000000L) // OLS dragged by the outlier
  }

  test("theilSenSlope: even pair count takes the LOWER median; equal-x excluded") {
    import graft.operators.EventAnalytics
    // 4 points, one equal-x pair (x=1 twice) → 5 usable pairs... rig to
    // an even count: points (0,0),(1,10),(1,20),(2,2) → pairs with
    // distinct x: (0,1a),(0,1b),(0,2),(1a,2),(1b,2) = 5 pairs (odd);
    // add (3,3): +4 pairs → 9... keep it simple: verify exclusion and
    // the (n+1) DIV 2 rank on a hand-set.
    val df = Seq(("k", 0L, 0L), ("k", 1L, 10L), ("k", 1L, 20L),
      ("k", 2L, 2L)).toDF("k", "x", "y")
    val got = EventAnalytics.theilSenSlope(df, "k", "x", "y")
      .as[(String, Long, Long)].collect().head
    // slopes micro: (0→1a) 10e6, (0→1b) 20e6, (0→2) 1e6,
    // (1a→2) -8e6, (1b→2) -18e6; sorted: -18e6,-8e6,1e6,10e6,20e6 —
    // median (rank 3 of 5) = 1e6; the x=1 pair contributes nothing
    assert(got === (("k", 5L, 1000000L)))
  }

  test("positionAttribution: U-split sums to exactly 1000 per conversion") {
    import graft.operators.EventAnalytics
    // user A: 5 touches (a,b,c,d,e) then purchase → 400/67/67/66/400
    // (200 DIV 3 = 66, remainder 2 → earliest two middles get +1).
    // user B: 1 touch → 1000. user C: purchase with no touches → orphan.
    val ev = Seq(
      ("A", "a", 10L, 1L), ("A", "b", 20L, 2L), ("A", "c", 30L, 3L),
      ("A", "d", 40L, 4L), ("A", "e", 50L, 5L), ("A", "purchase", 60L, 6L),
      ("B", "x", 10L, 7L), ("B", "purchase", 20L, 8L),
      ("C", "purchase", 99L, 9L))
      .toDF("k", "et", "t", "id")
    val got = EventAnalytics.positionAttribution(ev, "k", "et", "t", "id",
        "purchase", lookbackUs = 1000L)
      .as[(Option[String], Long)].collect().toMap
    assert(got === Map(Some("a") -> 400L, Some("b") -> 67L,
      Some("c") -> 67L, Some("d") -> 66L, Some("e") -> 400L,
      Some("x") -> 1000L, None -> 1000L))
    // conservation: total credit == 1000 × conversions
    assert(got.values.sum === 3000L)
    // n=2 and n=3 arms
    val ev2 = Seq(("D", "p1", 1L, 1L), ("D", "p2", 2L, 2L),
      ("D", "purchase", 3L, 3L),
      ("E", "q1", 1L, 4L), ("E", "q2", 2L, 5L), ("E", "q3", 3L, 6L),
      ("E", "purchase", 4L, 7L)).toDF("k", "et", "t", "id")
    val got2 = EventAnalytics.positionAttribution(ev2, "k", "et", "t", "id",
        "purchase", 1000L)
      .as[(Option[String], Long)].collect().toMap
    assert(got2 === Map(Some("p1") -> 500L, Some("p2") -> 500L,
      Some("q1") -> 400L, Some("q2") -> 200L, Some("q3") -> 400L))
  }

  test("kaplanMeierTable: censored rows extend risk set, never count as events") {
    import graft.operators.EventAnalytics
    // durations: 2(obs), 2(obs), 2(censored), 5(obs), 7(censored).
    // risk sets: t=2 → all 5; t=5 → {5,7} = 2; t=7 → 1 (no event row).
    val d = Seq((2L, true), (2L, true), (2L, false), (5L, true),
      (7L, false)).toDF("dur", "obs")
    val got = EventAnalytics.kaplanMeierTable(d, "dur", "obs")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got === List((2L, 5L, 2L), (5L, 2L, 1L)))
    // all-censored input → empty table (no event times)
    val cens = Seq((3L, false)).toDF("dur", "obs")
    assert(EventAnalytics.kaplanMeierTable(cens, "dur", "obs").isEmpty)
  }

  test("gapfillLocf: gap hours carry the last close; in-hour last wins by (ts, tie)") {
    import graft.operators.EventAnalytics
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:00")
    // key a: 00h has two events (later one wins), 01h empty, 02h one event
    // — the 01h grid row must carry 00h's close with observed=0.
    val ev = Seq(
      ("a", ts(10), 1L, 100L), ("a", ts(40), 2L, 200L),
      ("a", ts(130), 3L, 300L),
      ("b", ts(5), 4L, 7L)).toDF("k", "t", "id", "v")
    val got = EventAnalytics.gapfillLocf(ev, "k", "t", "v", "id")
      .select(col("k"), hour(col("h")).as("hh"), col("observed"),
        col("close_filled"))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 0, 1L, 200L), ("a", 1, 0L, 200L), ("a", 2, 1L, 300L),
      ("b", 0, 1L, 7L)))
    // same-ts tie broken by the tie column (higher id wins)
    val tie = Seq(("c", ts(0), 1L, 10L), ("c", ts(0), 2L, 20L))
      .toDF("k", "t", "id", "v")
    val g2 = EventAnalytics.gapfillLocf(tie, "k", "t", "v", "id")
      .select(col("close_filled")).as[Long].collect().toList
    assert(g2 === List(20L))
  }

  test("quantileNormalize: rank lookup onto pooled values, singleton → median") {
    // group x: values 0, 10, 20 (pcts 0, 500, 1000); group y: single 5
    // (pct 500). pooled sorted: 0, 5, 10, 20 (N=4) → idx = 1 + pct·3/1000:
    // pct0 → 1 (0), pct500 → 2 (5), pct1000 → 4 (20).
    val df = Seq(("x", 0L, 1L), ("x", 10L, 2L), ("x", 20L, 3L),
      ("y", 5L, 4L)).toDF("g", "v", "id")
    val got = Transforms.quantileNormalize(df, "g", "v", "id")
      .select(col("id"), col("norm_v")).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 5L, 3L -> 20L, 4L -> 5L))
    // outputs are always members of the pooled value set
    assert(got.values.toSet.subsetOf(Set(0L, 5L, 10L, 20L)))
  }

  test("gramNovelty: shared 8-grams counted, short docs absent") {
    val eight = "a b c d e f g h"
    val docs = Seq(
      (1L, eight + " unique1 tail1"),   // grams: 3; shares the first with 2
      (2L, eight + " other2"),          // grams: 2; shares the first with 1
      (3L, "w x y z p q r s t"),        // 2 grams, nobody shares
      (4L, "too short")                 // < 8 tokens → absent
    ).toDF("doc_id", "text")
    val got = Dedup.gramNovelty(docs, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((3L, 333L))) // 1 of 3 grams shared
    assert(got(2L) === ((2L, 500L))) // 1 of 2 shared
    assert(got(3L) === ((2L, 0L)))
    assert(!got.contains(4L))
  }

  test("disorderCensus: running high-water mark in arrival order") {
    import graft.operators.EventAnalytics
    // arrivals (id order) with ts 10,20,15,30,5: regressions at id 3
    // (late 5) and id 5 (late 25); threshold 10 catches only the 25.
    val df = Seq(("k", 10L, 1L), ("k", 20L, 2L), ("k", 15L, 3L),
      ("k", 30L, 4L), ("k", 5L, 5L)).toDF("k", "t", "id")
    val got = EventAnalytics.disorderCensus(df, "k", "t",
        Seq(col("id")), lateThreshold = 10L)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got === List(("k", 5L, 2L, 1L, 25L)))
  }

  test("compactChangelog: endpoints-only net op, batch-born-and-dead drops") {
    import graft.operators.Reconcile
    // k1: I,U,U → net I with the last value; k2: U,D → net D, no value;
    // k3: I,U,D → born and destroyed inside the batch, no output row;
    // k4: D,I → existed before, exists after → net U with I's value;
    // k5: lone U → net U.
    val log = Seq(
      ("k1", "I", 10L, 1L), ("k1", "U", 11L, 2L), ("k1", "U", 12L, 3L),
      ("k2", "U", 20L, 1L), ("k2", "D", 0L, 2L),
      ("k3", "I", 30L, 1L), ("k3", "U", 31L, 2L), ("k3", "D", 0L, 3L),
      ("k4", "D", 0L, 1L), ("k4", "I", 40L, 2L),
      ("k5", "U", 50L, 1L)).toDF("k", "op", "v", "seq")
    val got = Reconcile.compactChangelog(log, "k", "op", "v", Seq(col("seq")))
      .as[(String, String, Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "k1" -> (("I", Some(12L), 3L)),
      "k2" -> (("D", None, 2L)),
      "k4" -> (("U", Some(40L), 2L)),
      "k5" -> (("U", Some(50L), 1L))))
  }

  test("mergeIntervals: staggered chains merge, touching merge, nesting absorbs") {
    import graft.operators.EventAnalytics
    // x: [0,10) [5,20) [20,30) chain into ONE island (overlap then touch),
    //    [40,50) stands alone → 2 islands, covered 30+10, longest 30.
    // y: [0,100) absorbs [10,20) and [30,40) even though [30,40) starts
    //    after [10,20) ends — prefix-MAX, not previous row's end → 1 island.
    val iv = Seq(("x", 0L, 10L, 1L), ("x", 5L, 20L, 2L), ("x", 20L, 30L, 3L),
      ("x", 40L, 50L, 4L),
      ("y", 0L, 100L, 1L), ("y", 10L, 20L, 2L), ("y", 30L, 40L, 3L))
      .toDF("k", "t0", "t1", "id")
    val got = EventAnalytics.mergeIntervals(iv, "k", "t0", "t1",
        Seq(col("id")))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map("x" -> ((2L, 40L, 30L)), "y" -> ((1L, 100L, 100L))))
  }

  test("lagAutocorr: perfect trend = 1e6, alternation = -1e6, flat = null") {
    import graft.operators.EventAnalytics
    // up: strictly linear 1..5 → corr exactly +1 (micro 1000000);
    // alt: 0,10,0,10,.. → consecutive pairs perfectly anti-correlated;
    // flat: constant series → zero variance → NULL (not a crash or 0).
    val e = (1L to 5L).map(i => ("up", i * 10L, i)) ++
      (1L to 6L).map(i => ("alt", if (i % 2 == 0) 10L else 0L, i)) ++
      (1L to 4L).map(i => ("flat", 7L, i))
    val got = EventAnalytics.lagAutocorr(e.toDF("k", "v", "t"), "k", "v",
        Seq(col("t")))
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "up" -> ((4L, Some(1000000L))),
      "alt" -> ((5L, Some(-1000000L))),
      "flat" -> ((3L, None))))
  }

  test("weightedMedian: half-total crossing, weight-1 = lower median") {
    import graft.operators.Transforms
    // a: v=1 w=1, v=2 w=1, v=3 w=10 → total 12, half 6 — only v=3's
    // cumw (12) doubles past 12 ≥ 12 → median 3 (mass wins over count).
    // b: weights all 1 over 1,2,3,4 → cumw*2 ≥ 4 first at v=2 (lower
    // median of an even count).
    val df = Seq(("a", 1L, 1L, 1L), ("a", 2L, 1L, 2L), ("a", 3L, 10L, 3L),
      ("b", 1L, 1L, 1L), ("b", 2L, 1L, 2L), ("b", 3L, 1L, 3L),
      ("b", 4L, 1L, 4L)).toDF("g", "v", "w", "id")
    val got = Transforms.weightedMedian(df, "g", "v", "w", Seq(col("id")))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((3L, 12L)), "b" -> ((2L, 4L))))
  }

  test("largestRemainderApportion: quotas sum exactly, remainders ranked") {
    import graft.operators.Transforms
    // counts 1,1,1 with budget 10: base 3 each, leftover 1 goes to the
    // smallest key on the remainder tie → (a,b,c) = (4,3,3).
    val even = Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "cnt")
    val g1 = Transforms.largestRemainderApportion(even, Seq("k"), "cnt", 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(g1 === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
    // skewed: 5,3,2 over budget 7, total 10 → bases 3,2,1 (remainders
    // 5,1,4), one left → +1 to a (largest remainder 5).
    val skew = Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "cnt")
    val g2 = Transforms.largestRemainderApportion(skew, Seq("k"), "cnt", 7L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(g2 === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(g2.values.sum === 7L)
  }

  test("giniPermille: equal=0, degenerate concentration, zero-sum null") {
    import graft.operators.Transforms
    // eq: all equal → 0. conc: one row holds everything among 4 →
    // G = (2·4·100 − 5·100)/(4·100) = 300/400 → 750. zero: Σv=0 → NULL.
    val df = Seq(("eq", 5L, 1L), ("eq", 5L, 2L), ("eq", 5L, 3L),
      ("conc", 0L, 1L), ("conc", 0L, 2L), ("conc", 0L, 3L),
      ("conc", 100L, 4L),
      ("zero", 0L, 1L), ("zero", 0L, 2L)).toDF("g", "v", "id")
    val got = Transforms.giniPermille(df, "g", "v", Seq(col("id")))
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      "eq" -> ((3L, Some(0L))),
      "conc" -> ((4L, Some(750L))),
      "zero" -> ((2L, None))))
  }

  test("oovRate: occurrence-weighted, vocab ties break on token") {
    // k=2 vocab over counts {a:3, b:2, c:2, z:1} → {a, b} (b beats c on
    // the token tiebreak). src1 = "a a b c" → 1 OOV of 4 (250‰);
    // src2 = "a z c" → 2 OOV of 3 (666‰ floored).
    val docs = Seq((1L, "a a b c", "src1"), (2L, "a z c", "src2"),
      (3L, "b", "src1")).toDF("doc_id", "text", "source")
    val got = TextAnalysis.oovRate(docs, "text", "source", 2)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "src1" -> ((5L, 1L, 200L)), "src2" -> ((3L, 2L, 666L))))
  }

  test("activityBitmap: bucket boundary, bit 59, popcount") {
    import graft.operators.EventAnalytics
    // days 0, 59 land in bucket 0 at bits 0 and 59; day 60 opens bucket 1
    // at bit 0; duplicate day 0 must not change the mask (bit_or).
    val e = Seq((1L, 0L), (1L, 0L), (1L, 59L), (1L, 60L), (2L, 61L))
      .toDF("u", "day")
    val got = EventAnalytics.activityBitmap(e, "u", col("day"), 60)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      (1L, 0L) -> ((1L | (1L << 59), 2L)),
      (1L, 1L) -> ((1L, 1L)),
      (2L, 1L) -> ((1L << 1, 1L))))
  }

  test("hll rollup: union-merged estimate = direct sketch, within 5% of exact") {
    // The property hll_rollup demonstrates: merging per-group sketches
    // gives EXACTLY the estimate a single sketch over all rows gives
    // (mergeability — what makes the rollup free at 100 TB), and both
    // track exact distinct within the sketch's error envelope.
    val df = (1L to 2000L).map(i => (s"g${i % 4}", i % 701)).toDF("g", "v")
    val merged = df.groupBy("g").agg(hll_sketch_agg(col("v")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("u"))
      .select(hll_sketch_estimate(col("u"))).as[Long].first()
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg(col("v"))))
      .as[Long].first()
    val exact = df.select(countDistinct(col("v"))).as[Long].first()
    assert(merged === direct)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged=$merged exact=$exact")
  }

  test("pqCodes: per-subspace squared-L2 argmin, centroid-id tiebreak") {
    import graft.operators.Similarity
    // dim 4 split 2×2; codebook = vectors 0,1. v5's first half sits next
    // to c1's, second half next to c0's — codes differ per subspace.
    // v6 is EQUIDISTANT from both centroids in both subspaces → the
    // lowest centroid id must win both.
    val vecs = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(1f, 1f, 2f, 2f)),
      (5L, Seq(0.9f, 0.9f, 0.1f, 0.1f)),
      (6L, Seq(0.5f, 0.5f, 1f, 1f))).toDF("id", "vec")
    val got = Similarity.pqCodes(vecs, dim = 4, nSub = 2, nCentroids = 2)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((5L, 0)) === 1L && got((5L, 1)) === 0L)
    assert(got((6L, 0)) === 0L && got((6L, 1)) === 0L)
    // codebook rows code to themselves at distance 0
    assert(got((0L, 0)) === 0L && got((1L, 1)) === 1L)
  }

  test("streakCensus: rank-difference islands, duplicate days collapse") {
    import graft.operators.EventAnalytics
    // u1 active on days 1,2,3,7,8 (day 2 twice) → 5 distinct days,
    // longest streak 3. u2: single day → streak 1.
    val e = Seq((1L, 1L), (1L, 2L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
      (2L, 40L)).toDF("u", "day")
    val got = EventAnalytics.streakCensus(e, "u", col("day"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((5L, 3L)), 2L -> ((1L, 1L))))
  }

  test("ksDrift: disjoint supports = 1e6, identical mix = 0") {
    import graft.operators.EventAnalytics
    // a's values {1,2} vs rest c's {10,11}: disjoint supports → D = 1.
    // b and its rest (a∪c shifted): craft b's distribution IDENTICAL to
    // the pooled rest → D = 0: give every group the same values {1,2}.
    val disjoint = (Seq(("a", 1L), ("a", 2L)) ++
      Seq(("c", 10L), ("c", 11L))).toDF("g", "v")
    val d1 = EventAnalytics.ksDrift(disjoint, "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(d1 === Map("a" -> 1000000L, "c" -> 1000000L))
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L),
      ("c", 1L), ("c", 2L)).toDF("g", "v")
    val d0 = EventAnalytics.ksDrift(same, "g", "v")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    assert(d0 === Map("a" -> 0L, "b" -> 0L, "c" -> 0L))
  }

  test("readability: exact counts, sentence floor, wordless docs excluded") {
    // "Go now. Stop!" → 11 non-space chars, 3 words, 2 sentence runs.
    // "abc" → no terminator → sentence floor 1.
    // group g1: c=11+3=14, w=3+1=4, s=2+1=3 →
    // 4.71*14/4 + 0.5*4/3 - 21.43 = 16.485+0.66667-21.43 = -4.27833 →
    // ari_centi = -428.
    val docs = Seq((1L, "Go now. Stop!", "g1"), (2L, "abc", "g1"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.readability(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    assert(got === (("g1", 2L, 14L, 4L, 3L, -428L)))
  }

  test("degreeAssortativity: star = -1e6, regular graph undefined") {
    import graft.operators.GraphAlgos
    // Star K1,3: every edge joins deg-3 hub to deg-1 leaf → perfect
    // disassortativity, r = -1 exactly (micro -1000000).
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val rs = GraphAlgos.degreeAssortativity(star, "s", "d")
      .as[(Long, Option[Long])].collect().head
    assert(rs === ((6L, Some(-1000000L))))
    // Cycle C4: all degrees 2 → zero variance → NULL, not a crash.
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "d")
    val rc = GraphAlgos.degreeAssortativity(cyc, "s", "d")
      .as[(Long, Option[Long])].collect().head
    assert(rc === ((8L, None)))
  }

  test("tripletMargins: hardest pos is the far same-label, negative margin flags noise") {
    import graft.operators.Similarity
    // Label A points cluster at x-axis except a3 which sits ON the B
    // cluster (y-axis): a1's hardest positive is a3 (cos 0), hardest
    // negative is b1 (cos 0)... use distinct angles for strict order:
    // a1=(1,0), a2=(0.9,0.1), a3=(0,1) [mislabeled], b1=(0.1,0.9).
    // a1: pos cands {a2: ~0.993, a3: 0} → hard_pos 0; neg {b1: ~0.110}
    // → margin 0 - 110 < 0 → flags the noise.
    val vecs = Seq(
      (0L, Seq(1f, 0f), 1), (5L, Seq(0.9f, 0.1f), 1),
      (10L, Seq(0f, 1f), 1), (15L, Seq(0.1f, 0.9f), 2))
      .toDF("id", "vec", "label")
    val got = Similarity.tripletMargins(vecs.filter(col("id") === 0), vecs)
      .as[(Long, Int, Long, Long, Long)].collect().head
    assert(got._1 === 0L && got._3 === 0L)
    assert(got._4 === 110L && got._5 === -110L)
  }

  test("cumulativeUsers: new vs returning vs ever-seen, day gaps skip") {
    import graft.operators.EventAnalytics
    // day 1: u1,u2 (both new). day 3: u1 (returning), u3 (new).
    // day 7: u2 only → actives 1, new 0, cum stays 3.
    val e = Seq((1L, 1L), (2L, 1L), (1L, 3L), (3L, 3L), (2L, 7L), (2L, 7L))
      .toDF("u", "day")
    val got = EventAnalytics.cumulativeUsers(e, "u", col("day"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      1L -> ((2L, 2L, 2L)), 3L -> ((2L, 1L, 3L)), 7L -> ((1L, 0L, 3L))))
  }

  test("pathTrigrams: order by (t, id), no cross-user trigrams, tie order") {
    import graft.operators.EventAnalytics
    // u1 timeline a,b,a,b → trigrams "a b a", "b a b". u2: a,b (too
    // short, contributes nothing). Out-of-order input rows must not
    // matter (array_sort, not collect order).
    val e = Seq((1L, "a", 3L, 3L), (1L, "b", 4L, 4L), (1L, "a", 1L, 1L),
      (1L, "b", 2L, 2L), (2L, "a", 1L, 1L), (2L, "b", 2L, 2L))
      .toDF("u", "et", "t", "id")
    val got = EventAnalytics.pathTrigrams(e, "u", "et",
        Seq(col("t"), col("id")), 10)
      .as[(String, Long)].collect().toList
    assert(got === List(("a b a", 1L), ("b a b", 1L)))
  }

  test("multimodal: asset schema, stub decode batch shape, frame sampling") {
    val docs = Seq((7L, "hello world payload", "srcA")).toDF("doc_id", "text", "source")
    val assets = Multimodal.toAssets(docs, "doc_id", "text", "source", "video")
    val meta = assets.select("meta.byte_len").as[Long].first()
    assert(meta === "hello world payload".getBytes("UTF-8").length.toLong)
    val dec = Multimodal.decodeAssets(assets)
    val d = dec.collect().head
    assert(d.asset_id === 7L && d.modality === "video" && d.n_frames >= 1)
    val frames = Multimodal.sampleFrames(dec.toDF(), stride = 3)
    assert(frames.count() === (0 until d.n_frames by 3).size.toLong)
  }

  test("linkPrediction: wedge scores on a square, edges excluded, deg cap") {
    import graft.operators.GraphAlgos
    // square 1-2-3-4-1 (diagonals open) + triangle 5-6-7 (fully closed)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (5L, 6L), (6L, 7L), (5L, 7L)).toDF("a", "b")
    val got = GraphAlgos.linkPrediction(edges, "a", "b")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // diagonals: two shared degree-2 neighbors → RA = 2·(10⁶ DIV 2);
    // J = 2/(2+2−2) = 1. The closed triangle contributes NOTHING —
    // every wedge there is an existing edge (anti-join).
    assert(got === Map((1L, 3L) -> ((2L, 1000000L, 1000L)),
      (2L, 4L) -> ((2L, 1000000L, 1000L))))
    // mid-degree cap below every degree → no wedges at all
    assert(GraphAlgos.linkPrediction(edges, "a", "b", maxMidDeg = 1)
      .count() === 0L)
  }

  test("basketPairs: distinct collapse, minCount gate, integer scores") {
    // duplicate (b1, i1) row must not inflate counts; (1,3)/(2,3) fall
    // below minCount=2
    val items = Seq((10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L), (30L, 1L), (30L, 2L), (40L, 3L))
      .toDF("basket", "item")
    val got = Transforms.basketPairs(items, "basket", "item", minCount = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    val (a, b, nAb, cA, cB, sup, confAb, confBa) = got.head match {
      case t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8)
    }
    assert((a, b, nAb, cA, cB) === ((1L, 2L, 3L, 3L, 3L)))
    assert(sup === 750000L)     // 3 of 4 baskets
    assert(confAb === 1000L && confBa === 1000L)
  }

  test("ewmaDaily: dyadic weights, duplicate-day collapse, window cut") {
    import graft.operators.EventAnalytics
    // day1 has two rows (150+50); day40 is beyond day1+30 → own window
    val ev = Seq(("a", 0L, 100L), ("a", 1L, 150L), ("a", 1L, 50L),
      ("a", 40L, 300L)).toDF("k", "d", "c")
    val got = EventAnalytics.ewmaDaily(ev, "k", col("d"), col("c"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    // day0: only itself. day1: (2³⁰·200 + 2²⁹·100) DIV (2³⁰+2²⁹) =
    // 500 DIV 3 = 166. day40: 39 days back > horizon → only itself.
    assert(got === Map(0L -> ((100L, 1L, 100L)),
      1L -> ((200L, 2L, 166L)), 40L -> ((300L, 1L, 300L))))
  }

  test("cusumShift: prefix identity peaks and argmax days") {
    import graft.operators.EventAnalytics
    // daily [10,10,40], mean 20 → dev [-10,-10,20], cum [-10,-20,0]
    // S⁺ = cum − runmin = [0,0,20]; S⁻ = runmax − cum = [0,10,0]
    val ev = Seq(("a", 0L, 10L), ("a", 1L, 10L), ("a", 2L, 40L))
      .toDF("k", "d", "c")
    val got = EventAnalytics.cusumShift(ev, "k", col("d"), col("c"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("a", 20L, 2L, 10L, 1L)))
  }

  test("firstTouchAttribution: first-event credit, converter counts") {
    import graft.operators.EventAnalytics
    // u1: view→purchase→purchase; u2: click only; u3: view only
    val ev = Seq((1L, 1L, "view"), (1L, 2L, "purchase"), (1L, 3L, "purchase"),
      (2L, 1L, "click"), (3L, 1L, "view"))
      .toDF("u", "ts", "et")
    val got = EventAnalytics.firstTouchAttribution(ev, "u", "et",
        Seq(col("ts")), convType = "purchase")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got === Map("view" -> ((2L, 1L, 2L, 500L)),
      "click" -> ((1L, 0L, 0L, 0L))))
  }

  test("zipfSlope: exact power-law corpus regresses to slope ≈ −1") {
    // word r repeated round(1024/r) times, r = 1..20 → ln c ≈ ln1024 − ln r
    val docs = (1 to 20).map { r =>
      val n = math.round(1024.0 / r).toInt
      (r.toLong, Seq.fill(n)(f"w$r%02d").mkString(" "))
    }.toDF("id", "text")
    val got = TextAnalysis.zipfSlope(docs, "text", k = 20)
      .as[(Long, Long)].collect().head
    assert(got._1 === 20L)
    assert(got._2 > -1050000L && got._2 < -950000L,
      s"slope_micro=${got._2} not ≈ -1e6")
  }

  test("postingsHead: df dedups within doc, cap keeps lowest ids") {
    // token 'a' repeats inside doc 3 — df counts the DOC once
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a a a c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.postingsHead(docs, "text", "doc_id",
        k = 2, cap = 2)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map("a" -> ((3L, "1,2")), "b" -> ((2L, "1,2"))))
  }

  test("sourceJaccard: overlap permille, identical sources hit 1000") {
    val docs = Seq(("s1", "a b"), ("s2", "b c"), ("s3", "b a"))
      .toDF("src", "text")
    val got = TextAnalysis.sourceJaccard(docs, "text", "src")
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._6))).toMap
    assert(got === Map(("s1", "s2") -> ((1L, 333L)),
      ("s2", "s3") -> ((1L, 333L)), ("s1", "s3") -> ((2L, 1000L))))
  }

  test("lastTouchAttribution: window credit, tie by id, orphans conserve") {
    import graft.operators.EventAnalytics
    // u1: view@5 beats click@1; u2: click@1 outside [100,200) → orphan;
    // u3: no priors at all → orphan; u4: a@3/b@3 tie → higher id (b)
    val ev = Seq(
      (1L, "click", 1L, 11L), (1L, "view", 5L, 12L),
      (1L, "purchase", 10L, 13L),
      (2L, "click", 1L, 21L), (2L, "purchase", 200L, 22L),
      (3L, "purchase", 5L, 31L),
      (4L, "a", 3L, 41L), (4L, "b", 3L, 42L), (4L, "purchase", 10L, 43L))
      .toDF("u", "et", "ts", "id")
    val got = EventAnalytics.lastTouchAttribution(ev, "u", "et", "ts",
        "id", convType = "purchase", lookbackUs = 100L)
      .as[(Option[String], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(Some("view") -> ((1L, 250L)),
      Some("b") -> ((1L, 250L)), None -> ((2L, 500L))))
  }

  test("welchT: equal groups → t = 0; shifted group signs; n<2 → NULL") {
    import graft.operators.EventAnalytics
    // a = {0, 10} and b = {0, 10}: means equal → t exactly 0.
    // c = {100, 110}: vs rest mean 5, var terms hand-checkable; just pin
    // sign and magnitude ordering here (exact value pinned by oracle).
    val ev = Seq(("a", 0L), ("a", 10L), ("b", 0L), ("b", 10L),
      ("c", 100L), ("c", 110L)).toDF("g", "v")
    val got = EventAnalytics.welchT(ev, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a vs rest {0,10,100,110}: mean 5 vs 55 → strongly negative
    assert(got("a")._3.get < -1000000L)
    assert(got("c")._3.get > 1000000L)
    assert(got.values.forall(v => v._1 + v._2 === 6L))
    // singleton group → NULL t (variance undefined)
    val tiny = Seq(("a", 1L), ("b", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val t2 = EventAnalytics.welchT(tiny, "g", "v")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._4).toMap
    assert(t2("a").isEmpty && t2("b").isEmpty)
  }

  test("weightedSampleAES: exact A-ES keys, heavier rows rank higher") {
    // hand-compute the scores: u(id) = ((id·2654435761) % 2³² + 0.5)/2³²
    def score(id: Long, w: Long): Long =
      math.round(math.log(((id * 2654435761L) % 4294967296L + 0.5) /
        4294967296.0) / w * 1e12)
    val docs = Seq(("s", 1L, 100L), ("s", 2L, 100L), ("s", 3L, 100L),
      ("s", 4L, 10000L), ("z", 9L, 50L), ("z", 10L, 0L))
      .toDF("src", "id", "w")
    val got = TextAnalysis.weightedSampleAES(docs, "src", "id", "w", k = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    // weight-0 row excluded entirely; z keeps its one positive-weight row
    assert(!got.contains(("z", 10L)) && got(("z", 9L))._2 === 1L)
    // every kept score matches the hand formula bit-for-bit
    val expect = Map(1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 10000L)
    got.collect { case (("s", id), (sp, _)) =>
      assert(sp === score(id, expect(id)), s"id=$id") }
    // the 100× heavier row must be among s's top-2 (|ln u|/w shrinks)
    assert(got.contains(("s", 4L)))
  }

  test("chiSquare: independent grid → 0, perfect diagonal → n·dof") {
    import graft.operators.EventAnalytics
    // uniform 2×2, 5 per cell: o = e everywhere → chi2 exactly 0
    val indep = (for (x <- Seq("a", "b"); y <- Seq(0L, 1L);
      _ <- 1 to 5) yield (x, y)).toDF("x", "y")
    val i = EventAnalytics.chiSquare(indep, "x", "y")
      .as[(Long, Long, Long)].collect().head
    assert(i === ((0L, 1L, 4L)))
    // perfect association (diagonal only): chi2 = n = 10, dof 1 — and
    // the zero cells MUST contribute (dropping them gives 5, not 10)
    val dep = (for (v <- Seq(("a", 0L), ("b", 1L)); _ <- 1 to 5)
      yield v).toDF("x", "y")
    val d = EventAnalytics.chiSquare(dep, "x", "y")
      .as[(Long, Long, Long)].collect().head
    assert(d === ((10000L, 1L, 4L)))
  }

  test("boruvkaMst: cycle drops heaviest; set-equal to Kruskal at 40 nodes") {
    import graft.operators.GraphAlgos
    // square cycle: MST drops the heaviest edge (2-3, w=5); the
    // disconnected pair keeps its only edge → a 4-edge forest
    val square = Seq((1L, 2L, 1L), (2L, 3L, 5L), (3L, 4L, 2L),
      (4L, 1L, 4L), (9L, 10L, 7L)).toDF("a", "b", "w")
    val got = GraphAlgos.boruvkaMst(square, "a", "b", "w")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (3L, 4L, 2L), (1L, 4L, 4L),
      (9L, 10L, 7L)))

    // pseudo-random 40-node graph vs an independent Kruskal
    val raw = (0 until 40).flatMap(i => Seq(
      (i.toLong, ((i * 7 + 3) % 40).toLong),
      (i.toLong, ((i * 11 + 5) % 40).toLong)))
      .map { case (u, v) => (math.min(u, v), math.max(u, v)) }
      .filter { case (u, v) => u < v }.distinct
      .map { case (u, v) => (u, v, (u * 13 + v * 31) % 97) }
    val dist = GraphAlgos.boruvkaMst(raw.toDF("a", "b", "w"), "a", "b", "w")
      .as[(Long, Long, Long)].collect().toSet
    // Kruskal with the same (w, a, b) tie order + union-find
    val parent = Array.tabulate(40)(identity)
    def find(x: Int): Int = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    val kruskal = raw.sortBy { case (a, b, w) => (w, a, b) }
      .filter { case (a, b, _) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra == rb) false else { parent(ra) = rb; true }
      }.toSet
    assert(dist === kruskal)
  }

  test("gopherRules: each rule trips on its hand-built offender") {
    import graft.operators.TextAnalysis
    val good = ("the quick brown fox jumps over lazy dogs and cats " * 6).trim
    val docs = Seq(
      (1L, good), // 60 words, mean 4.0 chars, 2 stopwords → passes
      (2L, "short text"), // word count below the floor
      (3L, good + (" #" * 7)), // symbol ratio above 100‰
      (4L, ("aaaaaaaaaaaa " * 60).trim) // mean word length 12 > 10, no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got(1L) === ((60L, 4000L, 0L, 1000L, 2L, 1L)))
    assert(got(2L)._1 === 2L && got(2L)._6 === 0L)
    assert(got(3L)._3 > 100L && got(3L)._6 === 0L)
    assert(got(4L)._2 === 12000L && got(4L)._5 === 0L && got(4L)._6 === 0L)
    // zero-word doc: all permilles 0, fails, no division blowup
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val e = TextAnalysis.gopherRules(empty, "text", "doc_id").collect().head
    assert(e.getLong(6) === 0L)
  }

  test("cdcChunks: shift resistance — one inserted byte realigns, " +
      "interior chunks keep their signatures") {
    import graft.operators.Multimodal
    // deterministic pseudo-random payload, long enough for ~8 chunks
    // (splitmix-style high-bit take — a low-byte multiply cycles mod 256
    // and starves the boundary test of distinct windows)
    def byteAt(k: Long): Long =
      (((k + 7L) * 0x9E3779B97F4A7C15L) >>> 33) % 256L
    val orig = (0L until 2048L).map(byteAt)
    val shifted = 77L +: orig  // one byte INSERTED at the front
    val df = Seq((1L, orig), (2L, shifted)).toDF("aid", "bytes")
    val chunks = Multimodal.cdcChunks(df, "aid", "bytes")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val sig1 = chunks.filter(_._1 == 1L).map(c => (c._3, c._4)).toSet
    val sig2 = chunks.filter(_._1 == 2L).map(c => (c._3, c._4)).toSet
    assert(sig1.size >= 4, s"too few chunks: ${sig1.size}")
    // the CDC property: boundaries are content-local, so after the first
    // boundary the chunking REALIGNS — all but the first (len, sig)
    // chunks survive the insertion (a fixed-grid chunker keeps none)
    val shared = sig1 & sig2
    assert(shared.size >= sig1.size - 1,
      s"only ${shared.size}/${sig1.size} chunks survived the shift")
    // chunks partition the payload exactly
    val c1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(c1.head._2 === 0L && c1.map(_._3).sum === 2048L)
    c1.sliding(2).foreach { case Array(x, y) =>
      assert(y._2 === x._2 + x._3)
    }
  }

  test("cdcChunkRows: the position cube is TRUE modular arithmetic past " +
      "the old 2^63 overflow point (rel ≈ 2.1e6) — batch and streaming " +
      "twins agree with the BigInt reference, no ANSI throw") {
    import graft.operators.Multimodal
    val P = 1000000007L
    // one asset, a single byte at offset 2,200,000 — no boundary can
    // fire (no contiguous window), so the chunk is (off=0, len=1) and
    // its signature is (b+7)·(rel+13)³ mod P with rel past the point
    // where the raw cube used to overflow Long
    val k = 2200000L
    val b = 5L
    val rows = Seq((1L, k, b)).toDF("id", "k", "b")
    val sig = Multimodal.cdcChunkRows(rows)
      .select("chunk_sig").as[Long].collect().head
    val expected = ((BigInt(b + 7) *
      BigInt(k + 13).pow(3)) % P).toLong
    assert(sig === expected,
      s"batch cube diverged from the BigInt reference at rel=$k")
    // the streaming twin's cube is the same fold (unit-level identity:
    // replicate its arithmetic and compare to the reference)
    val r0 = Math.floorMod(k + 13L, P)
    val streamCube = Math.floorMod(Math.floorMod(r0 * r0, P) * r0, P)
    assert(Math.floorMod((b + 7L) * streamCube, P) === expected)
  }

  test("winnowFingerprints: shared-substring guarantee and density bound") {
    import graft.operators.TextAnalysis
    val shared = "zqxjkvbnmwpfl"  // 13 chars >= k + w - 1 = 11
    val docs = Seq(
      (1L, "aaaa bbbb cccc " + shared + " dddd eeee"),
      (2L, "totally different prefix text " + shared),
      (3L, "no overlap with anyone here at all errr")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "text", "doc_id",
        k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // Schleimer et al. §2: any shared substring of length >= k+w-1
    // guarantees at least one shared fingerprint
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // positions are valid gram starts and selections are per-doc distinct
    got.foreach { case (_, pos, _) => assert(pos >= 1L) }
    assert(got.length === got.distinct.length)
    // density: expected ~2/(w+1) = 0.4 of gram positions; generous band
    val grams3 = "no overlap with anyone here at all errr".length - 7
    val d3 = byDoc(3L).size.toDouble / grams3
    assert(d3 > 0.15 && d3 < 0.7, s"density=$d3")
  }

  test("alphaMixture: α=1 keeps everything; α<1 favors the scarce stratum") {
    import graft.operators.TextAnalysis
    val docs = ((1L to 90L).map(i => (i, "big")) ++
      (91L to 100L).map(i => (i, "small"))).toDF("doc_id", "lang")
    // α = 1: p^1 target == observed mixture → every rate is 10⁶, no drop
    val all = TextAnalysis.alphaMixture(docs, col("lang"), col("doc_id"),
      alpha = 1.0)
    assert(all.count() === 100L)
    assert(all.select("rate_ppm").distinct().as[Long].collect().toSet
      === Set(1000000L))
    // α = 0.5 flattens: the scarce stratum is kept whole (rate capped at
    // 10⁶), the abundant one downsampled; hand math: w = round(√.9·10⁶)
    // = 948683, round(√.1·10⁶) = 316228 → t_big = ⌊948683·10⁶/1264911⌋
    // = 749999 ppm → rate_big = ⌊749999·100/90⌋ = 833332 ppm
    val half = TextAnalysis.alphaMixture(docs, col("lang"), col("doc_id"),
      alpha = 0.5)
    val rates = half.select("lang", "rate_ppm").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates("small") === 1000000L)
    assert(rates("big") === 833332L)
    // keep decision is the Knuth predicate, bit-for-bit
    val keptBig = half.filter(col("lang") === "big")
      .select("doc_id").as[Long].collect().toSet
    val wantBig = (1L to 90L)
      .filter(i => (i * 2654435761L) % 1000000L < 833332L).toSet
    assert(keptBig === wantBig)
  }

  test("knLogProb: hand-computed Kneser-Ney values; mass stays sub-unit") {
    import graft.operators.TextAnalysis
    // corpus "a b a b a c": bigrams "a b"×2, "b a"×2, "a c"×1
    // b: (a b, 2), (b a, 2), (a c, 1); f: a→(c1=3, fw=2), b→(2, 1);
    // r: b→1, a→1, c→1; B = 3
    // P(b|a) = (5·3 + 3·2·1)/(4·3·3) = 21/36;  P(c|a) = (3+6)/36 = 1/4
    // P(a|b) = (5·3 + 3·1·1)/(4·2·3) = 18/24 = 3/4
    // observed mass per context < 1 (KN reserves continuation mass)
    assert(21.0 / 36 + 9.0 / 36 < 1.0 && 18.0 / 24 < 1.0)
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.knLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def lp(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) * 1e6)
    val want = math.round(
      (2 * lp(21, 36) + 2 * lp(18, 24) + lp(9, 36)).toDouble / (5 * 1000.0))
    assert(got(1L) === want)
  }

  test("knLogProbPruned: hand-computed pruned values; per-context mass" +
      " exactly 1") {
    import graft.operators.TextAnalysis
    // corpus "a b a b a c": bigrams "a b"×2, "b a"×2, "a c"×1 (singleton,
    // pruned). Kept: (a b, 2), (b a, 2) → B′ = 2; r′: b→1, a→1, c→0
    // f: a→(c1=3, fw=1, n1=1), b→(c1=2, fw=1, n1=0)
    // P(b|a) = (5·2 + (3·1+4·1)·1)/(4·3·2) = 17/24
    // P(c|a) = (0 + 7·0)/24 → floored numerator 1 → 1/24 (epsilon tier)
    // P(a|b) = (5·2 + (3·1+4·0)·1)/(4·2·2) = 13/16
    // exact normalization over kept continuations for context a:
    // 17/24 + 7/24 (the a-continuation backoff) = 1 — the pruned model
    // is a proper distribution, not an approximation
    assert(17 + 7 === 24 && 13 + 3 === 16)
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.knLogProbPruned(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def lp(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) * 1e6)
    val want = math.round(
      (2 * lp(17, 24) + 2 * lp(13, 16) + lp(1, 24)).toDouble / (5 * 1000.0))
    assert(got(1L) === want)
  }

  test("kn3LogProbPruned: hand-computed trigram values; per-context" +
      " mass exactly 1 over the continuation vocabulary") {
    import graft.operators.TextAnalysis
    // corpus "a b c a b c a b d": trigrams abc×2, bca×2, cab×2, abd×1
    // (abd singleton, pruned). Kept kt = {abc, bca, cab} → ct: (b,c),
    // (c,a), (a,b) each r23=1; B2=3; mid: a/b/c → (m2=1, g2=1);
    // un: a/b/c → rw3=1, d absent.
    // cx: "a b" → (c12=3, fw=1, n1=1); "b c"/"c a" → (2, 1, 0).
    // P(c|a b) = [5·4·1·3 + 7·(1·3 + 3·1·1)] / (16·3·1·3) = 102/144
    // P(a|b c) = [60 + 3·(3+3)] / 96 = 78/96;  P(b|c a) = 78/96
    // P(d|a b): no kept (b,d) continuation, rw3(d)=0 → numerator 0,
    // floored to the 1/144 epsilon.
    // Exact mass for context "a b" over the continuation vocab {a,b,c}:
    // kept term 60 + back-off 7·(3+3) + 7·(0+3) + 7·(0+3) = 144 = den.
    assert(60 + 42 + 21 + 21 === 144)
    val docs = Seq((1L, "a b c a b c a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.kn3LogProbPruned(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def lp(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) * 1e6)
    val want = math.round((2 * lp(102, 144) + 4 * lp(78, 96) +
      lp(1, 144)).toDouble / (7 * 1000.0))
    assert(got(1L) === want)
    // a 2-token document has no trigram and emits no row
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(TextAnalysis.kn3LogProbPruned(short, "text", "doc_id")
      .count() === 0L)
  }

  test("sourceUnigramKl: hand-computed add-1-smoothed divergences") {
    import graft.operators.TextAnalysis
    // A = "a a b", B = "a c": joint vocab V=3, totals N_A=3, N_B=2.
    // KL(A||B) grid terms (cs+1)·ln((cs+1)(Nr+V)/((cr+1)(Ns+V))):
    //   a: 3·ln(15/12), b: 2·ln(10/6), c(smoothed zero): 1·ln(5/12)
    // each quantized to micros BEFORE the integer sum, then DIV (Ns+V)
    val docs = Seq(("A", "a a b"), ("B", "a c")).toDF("source", "text")
    val got = TextAnalysis.sourceUnigramKl(docs, "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    def q(num: Long, den: Long): Long =
      math.round(math.log(num.toDouble / den.toDouble) * 1e6)
    val wantA = Math.floorDiv(3 * q(15, 12) + 2 * q(10, 6) + q(5, 12), 6L)
    val wantB = Math.floorDiv(2 * q(12, 15) + q(6, 10) + 2 * q(12, 5), 5L)
    assert(got === Map("A" -> (3L, wantA), "B" -> (2L, wantB)))
    // divergence from the rest is positive for genuinely different
    // sources on both sides
    assert(wantA > 0 && wantB > 0)
  }

  test("coverageCurve: hand-computed decile coverage; Zipf head " +
      "dominates") {
    import graft.operators.TextAnalysis
    // 10 types with counts 10,9,...,1 (N=55): decile d covers the top
    // d types exactly, permille = 1000·(sum of top d) DIV 55
    val words = (1 to 10).flatMap(i => Seq.fill(11 - i)(s"w$i"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.coverageCurve(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.size === 10)
    val pfx = (1 to 10).scanLeft(0)((s, i) => s + (11 - i)).tail
    (1 to 10).foreach { d =>
      assert(got(d.toLong) === (d.toLong, 1000L * pfx(d - 1) / 55),
        s"decile $d")
    }
    // the curve is strictly monotone and closes at full coverage
    assert((1 to 9).forall(d => got(d.toLong)._2 < got(d + 1L)._2))
    assert(got(10L) === (10L, 1000L))
  }

  test("unimaxAllocation: hand-computed waterfill — pivot, remainder " +
      "distribution, and the budget-covers-everything case") {
    import graft.operators.TextAnalysis
    def docs(ns: (String, Int)*) = ns.flatMap { case (l, n) =>
      (1 to n).map(i => (l, s"$l-$i")) }.toDF("lang", "text")
    def run(df: org.apache.spark.sql.DataFrame, e: Int, bpm: Int) =
      TextAnalysis.unimaxAllocation(df, "lang", e, bpm)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // caps [1,5,5] (E=1), N=11, budget 910permille -> B=10: a takes its
    // full cap (theta_1 = 3 >= 1), pivot at b (theta_2 = (10-1)/2 = 4
    // < 5), level 4, remainder 9 - 8 = 1 goes to b (first leveled in
    // the (cap, lang) order): a=1, b=5, c=4 — and the +1 never exceeds
    // a leveled cap since every leveled cap > theta
    val m1 = run(docs("a" -> 1, "b" -> 5, "c" -> 5), 1, 910)
    assert(m1 === Map("a" -> (1L, 1L, 1L), "b" -> (5L, 5L, 5L),
      "c" -> (5L, 5L, 4L)))
    assert(m1.values.map(_._3).sum === 10L)
    // budget covers every cap (E=2, B = 2.2N > 2N): no pivot, everyone
    // takes the full cap — the empty-level-row path
    val m2 = run(docs("a" -> 1, "b" -> 5, "c" -> 5), 2, 2200)
    assert(m2 === Map("a" -> (1L, 2L, 2L), "b" -> (5L, 10L, 10L),
      "c" -> (5L, 10L, 10L)))
    // tight budget: B = 11*500/1000 = 5; theta_1 = 5/3 = 1 does NOT
    // exceed a's cap 1 (a still takes it all), pivot at b with level
    // (5-1)/2 = 2 and zero remainder: a=1, b=2, c=2
    val m3 = run(docs("a" -> 1, "b" -> 5, "c" -> 5), 1, 500)
    assert(m3("a")._3 + m3("b")._3 + m3("c")._3 === 5L)
    assert(m3 === Map("a" -> (1L, 1L, 1L), "b" -> (5L, 5L, 2L),
      "c" -> (5L, 5L, 2L)))
    // a NULL stratum sorts LAST (the oracle's DuckDB ASC semantics,
    // explicit asc_nulls_last on the engine side): at a cap tie on the
    // pivot with remainder 1, "b" (first in order) takes the extra unit
    val withNull = (Seq.fill(3)((null: String, "x")) ++
      Seq.fill(3)(("b", "x"))).toDF("lang", "text")
    val m4 = run(withNull, 1, 834) // N=6 -> B=5; caps [3,3]; lvl 2 r 1
    assert(m4 === Map("b" -> (3L, 3L, 3L), (null: String) -> (3L, 3L, 2L)))
  }

  test("charEntropy: uniform text hits ln(alphabet) exactly; constant" +
      " text is 0") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "abcdabcdabcd"), // uniform over 4 chars → H = ln(4) micros
      (2L, "aaaaaaa"),      // one symbol → 0
      (3L, "ab")            // uniform over 2 → ln(2) micros
    ).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // every char count c = n/4 → each type's q = round(ln(4)·1e6), and
    // Σ c·q DIV n = q exactly (no floor loss on uniform distributions)
    assert(got(1L) === (12L, math.round(math.log(4) * 1e6)))
    assert(got(2L) === (7L, 0L))
    assert(got(3L) === (2L, math.round(math.log(2) * 1e6)))
  }

  test("bigramCondEntropy: deterministic chains score 0; a 2-way branch" +
      " scores its exact share of ln(2)") {
    import graft.operators.TextAnalysis
    // "a b a b a b": every context has ONE follower → H = 0
    val det = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val h0 = TextAnalysis.bigramCondEntropy(det, "text", "doc_id")
      .head()
    assert(h0.getLong(0) === 5L && h0.getLong(1) === 0L)
    // "a b a c": context a branches 2 ways (c1=2, c12=1 each →
    // q = round(ln 2·1e6) per type, weight 1 each); context b is
    // deterministic → H = 2·q DIV 3
    val br = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val h1 = TextAnalysis.bigramCondEntropy(br, "text", "doc_id").head()
    val q = math.round(math.log(2) * 1e6)
    assert(h1.getLong(0) === 3L && h1.getLong(1) === (2 * q) / 3)
  }

  test("gopherRepetition: hand-computed signals on degenerate text") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "ab ab ab ab"),      // total repetition: every signal maxed
      (2L, "a b c d e f g h i j k l"), // all distinct: every signal 0
      (3L, "x"),                 // sub-2-token: row of zeros, passes
      (4L, ("u v w " * 20).trim) // 3-period cycle: dup grams everywhere
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRepetition(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (1 to 11).map(r.getLong).toVector).toMap
    // doc 1: n_chars=11; 2-grams: "ab ab"×3 → top2 = 3·5=15 → 1363‰;
    // 3-grams "ab ab ab"×2 → top3 = 2·8=16 → 1454‰; 4-gram unique →
    // top4 = 11 → 1000‰; no n≥5 windows → dup5..10 = 0; fails (top2>200)
    assert(got(1L)(0) === 11L)
    assert(got(1L)(1) === 1363L && got(1L)(2) === 1454L &&
      got(1L)(3) === 1000L)
    assert((4 to 9).forall(got(1L)(_) === 0L) && got(1L)(10) === 0L)
    // doc 2: every window distinct → top_n = one window's chars,
    // dup_n = 0 → top2 = 3·1000/23 = 130‰, but a SINGLE 3-gram already
    // covers 5·1000/23 = 217‰ > 180 — short docs trip the top-n caps by
    // construction (Gopher's caps presume long documents), so pass=0
    assert(got(2L)(1) === 130L && (4 to 9).forall(got(2L)(_) === 0L))
    assert(got(2L)(2) === 217L && got(2L)(10) === 0L)
    // doc 3: no windows at all → zeros, passes
    assert(got(3L) === Vector(1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // doc 4: period-3 text — every 5..10-gram occurs ≥2 times → dup_n
    // = full coverage (≈1000‰ scaled by window span), all caps blown
    assert((4 to 9).forall(got(4L)(_) > 500L) && got(4L)(10) === 0L)
  }

  test("bm25TopK: integer saturation matches the closed formula") {
    // corpus: tf/df/dl all hand-known; query = df-ranks 1..2 (y, z)
    val docs = Seq((1L, "x x y"), (2L, "x y z"), (3L, "y z z"),
      (4L, "z w")).toDF("doc_id", "text")
    val (n, s) = (4L, 11L)
    def idfMicro(df: Long): Long =
      math.round(math.log((n.toDouble - df + 0.5) / (df + 0.5)) * 1e6)
    def contrib(df: Long, tf: Long, dl: Long): Long =
      math.round(idfMicro(df) * ((44.0 * tf * s) /
        (20.0 * tf * s + 6.0 * s + 18.0 * dl * n)))
    // df(y)=3, df(z)=3; per-doc (tf_y, tf_z, dl)
    val expect = Map(
      1L -> contrib(3, 1, 3),                      // y only
      2L -> (contrib(3, 1, 3) + contrib(3, 1, 3)), // y + z
      3L -> (contrib(3, 1, 3) + contrib(3, 2, 3)), // y + 2z
      4L -> contrib(3, 1, 2))                      // z in a 2-token doc
    val got = TextAnalysis.bm25TopK(docs, "text", "doc_id",
        qRankLo = 1, qRankHi = 2, k = 4)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got === expect)
  }

  test("pcaPower: rank-1 plane recovers exact axis and eigenvalue") {
    import graft.operators.Similarity
    // vectors (2t, t, 0, 0), t ∈ {−3,−1,1,3}: mean 0, C = [[20,10],[10,5]]
    // (zero-padded) → top eigvec ∝ (2,1), λ = 25, second eigenvalue 0.
    // Integer fixed-point contract: loadings MAX-normalized in micros —
    // (10⁶, 5·10⁵, 0, 0) EXACTLY (the scaled covariance divides evenly),
    // eigenvalue in micros exactly 25e6.
    val emb = Seq(-3f, -1f, 1f, 3f).map(t =>
        Tuple1(Seq(2 * t, t, 0f, 0f)))
      .toDF("embedding")
    val got = Similarity.pcaPower(emb, "embedding")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    val loadings = got.map(_._2)
    assert(loadings.toSeq === Seq(1000000L, 500000L, 0L, 0L))
    assert(got.map(_._3).distinct.toSeq === Seq(25000000L))
    // determinism: a second run is bit-identical
    val again = Similarity.pcaPower(emb, "embedding")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }

  test("neighborhoodFunction: HLL estimates track exact reach, hop by hop") {
    import graft.operators.GraphAlgos
    // pseudo-random sparse digraph on 120 nodes, made undirected — large
    // enough that HLL error (m=256 → σ≈6.5% per node) averages out in the
    // per-hop SUM, small enough to expand exactly.
    val n = 120
    val base = for (i <- 0L until n; j <- 0L until n
      if i != j && (i * 37 + j * 101) % 17 == 0) yield (i, j)
    val edges = (base ++ base.map(_.swap)).toDF("src", "dst")
    val got = GraphAlgos.neighborhoodFunction(edges, "src", "dst",
        maxHops = 2, p = 8)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // exact neighborhood function by pair expansion
    val adj = (base ++ base.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keySet
    var balls: Map[Long, Set[Long]] = nodes.map(v => v -> Set(v)).toMap
    val exact = scala.collection.mutable.ArrayBuffer(
      balls.values.map(_.size).sum.toLong)
    for (_ <- 1 to 2) {
      balls = balls.map { case (v, s) =>
        v -> (s ++ s.flatMap(u => adj.getOrElse(u, Set.empty[Long])))
      }
      exact += balls.values.map(_.size).sum.toLong
    }
    assert(got.map(_._1).toSeq === Seq(0, 1, 2))
    assert(got.forall(_._2 === nodes.size.toLong))
    got.zip(exact).foreach { case ((hop, _, est), ex) =>
      assert(math.abs(est - ex).toDouble / ex <= 0.15,
        s"hop $hop: est $est vs exact $ex")
    }
    // estimates are monotone in hops (register max is monotone)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
    // determinism: a second run is bit-identical
    val again = GraphAlgos.neighborhoodFunction(edges, "src", "dst",
        maxHops = 2, p = 8)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }

  test("greedyCoverage: hand corpus — argmax order, marginal gains, ties") {
    // doc 1 covers {a b c d}, doc 2 {c d e}, doc 3 {e f}, doc 4 {a b}.
    // Greedy: pick 1 (gain 4); then 2 and 3 both add 2 new — tie breaks
    // to smaller id (2, gain {e}+... = 2: c,d covered → e only? {c d e}
    // minus {a b c d} = {e} → gain 1; doc 3 adds {e f} → gain 2. So pick
    // 3 (gain 2); then doc 2 adds nothing new (c,d,e covered) and doc 4
    // adds nothing — candidates with zero gain drop out → exhausted.
    val docs = Seq((1L, "a b c d"), (2L, "c d e"), (3L, "e f"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.greedyCoverage(docs, "doc_id", "text", k = 4)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1, 1L, 4L), (2, 3L, 2L)))
    // duplicate tokens inside a doc count once
    val dup = Seq((7L, "x x x y"), (8L, "z")).toDF("doc_id", "text")
    val got2 = TextAnalysis.greedyCoverage(dup, "doc_id", "text", k = 2)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got2.toSeq === Seq((1, 7L, 2L), (2, 8L, 1L)))
    // gram=2: units are word bigrams; "x x x y" → {"x x","x y"} (distinct),
    // single-word docs contribute no unit at all
    val bg = Seq((7L, "x x x y"), (8L, "z"), (9L, "x y"))
      .toDF("doc_id", "text")
    val got3 = TextAnalysis.greedyCoverage(bg, "doc_id", "text",
        k = 3, gram = 2)
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got3.toSeq === Seq((1, 7L, 2L)))
  }

  test("TopKAgg: ties, k>n, partial-merge stability across partitions") {
    import graft.functions.TopKAgg
    // (v desc, id asc): ties at v=5 keep the SMALLER id first; group B
    // has fewer rows than k
    val df = Seq(("A", 5L, 2L), ("A", 5L, 1L), ("A", 7L, 9L),
      ("A", 3L, 0L), ("A", 7L, 10L), ("B", 1L, 4L))
      .toDF("g", "v", "id").repartition(4) // force partial buffers + merge
    val got = df.groupBy("g")
      .agg(TopKAgg.topK(col("v"), col("id"), 3).as("t"))
      .select(col("g"), expr("t.v").as("vs"), expr("t.id").as("ids"))
      .as[(String, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("A") === ((Seq(7L, 7L, 5L), Seq(9L, 10L, 1L))))
    assert(got("B") === ((Seq(1L), Seq(4L))))
    // determinism under re-run (merge order must not matter)
    val again = df.groupBy("g")
      .agg(TopKAgg.topK(col("v"), col("id"), 3).as("t"))
      .select(col("g"), expr("t.v"), expr("t.id"))
      .as[(String, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again === got)
    // random cross-check vs sort-take, with k smaller than every group
    val rnd = new scala.util.Random(5L)
    val rows = (0 until 400).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(50).toLong, rnd.nextLong().abs))
    val big = rows.toDF("g", "v", "id").repartition(8)
    val heap = big.groupBy("g")
      .agg(TopKAgg.topK(col("v"), col("id"), 5).as("t"))
      .select(col("g"), expr("t.v").as("vs"), expr("t.id").as("ids"))
      .as[(String, Seq[Long], Seq[Long])].collect()
      .map(r => r._1 -> r._2.zip(r._3)).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val expect = grp.map(t => (t._2, t._3))
        .sortBy { case (v, id) => (-v, id) }.take(5)
      assert(heap(g).toSeq === expect, s"group $g")
    }
  }

  test("contaminationSpans: diagonal islands find the exact shared run") {
    // train "a b c d e f" vs bench "x b c d e y" share "b c d e": three
    // consecutive matched bigrams on one diagonal → span 3 + (2-1) = 4
    val train = Seq((1L, "a b c d e f"), (2L, "p q")).toDF("doc_id", "text")
    val bench = Seq((10L, "x b c d e y")).toDF("doc_id", "text")
    val got = Dedup.contaminationSpans(train, bench, "text", "doc_id", n = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 10L, 4L, 3L, 1L)))
    // two separate runs: shared "a b" and (later, different offset)
    // "e f" → two islands, max span 2, 2 matched bigrams
    val t2 = Seq((3L, "a b z z z e f")).toDF("doc_id", "text")
    val b2 = Seq((20L, "a b q e f")).toDF("doc_id", "text")
    val got2 = Dedup.contaminationSpans(t2, b2, "text", "doc_id", n = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got2.toSeq === Seq((3L, 20L, 2L, 2L, 2L)))
    // disjoint texts → no row at all
    assert(Dedup.contaminationSpans(
      Seq((4L, "m n o")).toDF("doc_id", "text"),
      Seq((30L, "u v w")).toDF("doc_id", "text"),
      "text", "doc_id", n = 2).count() === 0L)
  }

  test("rankAuc: perfect / reversed / all-tied orderings, exact ppm") {
    val mk = (rows: Seq[(Long, Boolean)]) =>
      Transforms.rankAuc(rows.toDF("s", "pos"), col("s"), col("pos"))
        .as[(Long, Long, Long)].collect().head
    // perfect separation → 1.0
    assert(mk(Seq((3L, true), (4L, true), (1L, false), (2L, false))) ===
      ((2L, 2L, 1000000L)))
    // reversed → 0.0
    assert(mk(Seq((1L, true), (2L, false))) === ((1L, 1L, 0L)))
    // everything tied → exactly 0.5 (midrank convention)
    assert(mk(Seq((5L, true), (5L, true), (5L, false), (5L, false))) ===
      ((2L, 2L, 500000L)))
    // mixed with a tie: pos {2,3}, neg {1,2} → U = 1·(pos2 vs neg1) +
    // ½·(pos2 vs neg2) + 2·(pos3 above both)/… = (2·1+1 + 2·2+0)/?
    // exact: num2 = np(2)*1·(2·1+1) + np(3)*1·(2·2+0) = 3 + 4 = 7 →
    // 7·1e6 // 8 = 875000
    assert(mk(Seq((2L, true), (3L, true), (1L, false), (2L, false))) ===
      ((2L, 2L, 875000L)))
  }

  test("medianPolish: outlier isolated in one residual cell") {
    // 2×2 grid [[1,2],[3,40]]: row lower-medians (1,3) sweep out, then
    // col (0,1) — the 40 outlier lands ENTIRELY in its own residual
    // (r2,cB → 36); round 2 is a no-op on this grid (fixpoint)
    val g = Seq(("r1", "cA", 1L), ("r1", "cB", 2L),
      ("r2", "cA", 3L), ("r2", "cB", 40L)).toDF("r", "c", "v")
    val got = Transforms.medianPolish(g, "r", "c", "v", rounds = 2)
      .as[(String, String, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq === Seq(
      ("r1", "cA", 0L, 1L, 0L), ("r1", "cB", 0L, 1L, 1L),
      ("r2", "cA", 0L, 3L, 0L), ("r2", "cB", 36L, 3L, 1L)))
    // decomposition invariant: v = row_eff + col_eff + resid, every cell
    got.foreach { case (r, c, resid, re, ce) =>
      val orig = Map(("r1", "cA") -> 1L, ("r1", "cB") -> 2L,
        ("r2", "cA") -> 3L, ("r2", "cB") -> 40L)((r, c))
      assert(orig === re + ce + resid, s"cell ($r,$c)")
    }
  }

  test("kTruss: K4 survives, pendants peel, deletions cascade across rounds") {
    import graft.operators.GraphAlgos
    // K4 (every edge in 2 triangles) + pendant 4-5: k=3 keeps K4 with
    // support 2, drops the pendant in round 1
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)) :+
      ((4L, 5L))
    val got = GraphAlgos.kTruss(k4.toDF("s", "d"), "s", "d", k = 3,
        rounds = 2)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2)).toSeq ===
      (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)).toSeq)
    assert(got.forall(_._3 === 2L))
    // cascade: two triangles sharing edge (2,3) — at k=4 only (2,3) has
    // support 2, survives round 1, then its triangles are gone → round 2
    // deletes it too: empty truss (a 1-round bound would miss this)
    val chain = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L))
    assert(GraphAlgos.kTruss(chain.toDF("s", "d"), "s", "d", k = 4,
      rounds = 2).count() === 0L)
    assert(GraphAlgos.kTruss(chain.toDF("s", "d"), "s", "d", k = 4,
      rounds = 1).count() === 1L)
  }

  test("maintainJoinView: delta algebra equals the monolithic join") {
    import graft.operators.Reconcile
    val aOld = Seq((1L, "p1"), (2L, "p2")).toDF("ak", "attr")
    val dA = Seq((3L, "p3")).toDF("ak", "attr")
    val bOld = Seq((1L, 10L), (3L, 30L)).toDF("bk", "v")
    val dB = Seq((2L, 20L), (3L, 31L)).toDF("bk", "v")
    val inc = Reconcile.maintainJoinView(aOld, dA, bOld, dB, "ak", "bk")
      .select("ak", "attr", "v").as[(Long, String, Long)].collect().sorted
    val mono = aOld.union(dA).join(bOld.union(dB), col("ak") === col("bk"))
      .select("ak", "attr", "v").as[(Long, String, Long)].collect().sorted
    assert(inc.toSeq === mono.toSeq)
    assert(inc.length === 4) // (1,10) (2,20) (3,30) (3,31) — no dup, no loss
  }

  test("isotonicFit: PAV pools — violation collapse, weights, identity") {
    // [1,3,2,4] at n=1 each: 3>2 violates → pool {3,2} at mean 2.5;
    // pools (x=0: 1/1), (x=1: 5/2), (x=3: 4/1)
    val a = Seq(("g", 0, 1, 1), ("g", 1, 3, 1), ("g", 2, 2, 1),
      ("g", 3, 4, 1)).toDF("g", "x", "s", "n")
    val gotA = Transforms.isotonicFit(a, "g", "x", "s", "n")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(gotA.map(t => (t._2, t._3, t._4, t._5)).toSeq === Seq(
      (0L, 0L, 1L, 1L), (1L, 1L, 5L, 2L), (2L, 1L, 5L, 2L),
      (3L, 3L, 4L, 1L)))
    // weighted merge: mean 10 then mean 1 (weight 2) → one pool 12/3;
    // cascade must reach all the way back
    val b = Seq(("g", 0, 10, 1), ("g", 1, 2, 2)).toDF("g", "x", "s", "n")
    val gotB = Transforms.isotonicFit(b, "g", "x", "s", "n")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(gotB.map(t => (t._4, t._5)).toSeq === Seq((12L, 3L), (12L, 3L)))
    // already monotone: identity, one pool per point; groups independent
    val c = Seq(("g1", 0, 1, 1), ("g1", 1, 2, 1), ("g2", 0, 9, 1))
      .toDF("g", "x", "s", "n")
    val gotC = Transforms.isotonicFit(c, "g", "x", "s", "n")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(gotC.map(t => (t._1, t._4, t._5)).toSeq ===
      Seq(("g1", 1L, 1L), ("g1", 2L, 1L), ("g2", 9L, 1L)))
  }

  test("poissonBootstrap: pinned thresholds, mean multiplicity ≈ 1") {
    // the inverse-CDF cut points are driver-computed constants shared
    // with the SQL twin — pin them so a drift breaks loudly
    assert(Transforms.poissonHexThresholds ===
      Seq("5e2d5", "bc5ab", "eb715", "fb239"))
    val df = (1L to 2000L).toDF("id")
    val got = Transforms.poissonBootstrap(df, col("id"), lit(1L), reps = 8)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 8)
    // E[multiplicity] = 1 (capped at 4: bias < 0.4%) → n_eff ≈ 2000/rep
    val mean = got.map(_._2).sum.toDouble / (8 * 2000)
    assert(math.abs(mean - 1.0) <= 0.03, s"mean multiplicity $mean")
    // weighted sum of a constant 1 equals n_eff
    assert(got.forall(r => r._2 === r._3))
    // determinism
    val again = Transforms.poissonBootstrap(df, col("id"), lit(1L), reps = 8)
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("infoGainRanking: perfect predictor = H(T); independent = 0") {
    // 8 rows, target t ∈ {p, q} balanced. `copy` mirrors t exactly →
    // IG = H(T) = ln 2 ≈ 0.693 nats → 693 permille. `noise` is constant →
    // IG = 0. `half` splits t perfectly too but via 4 values.
    val rows = Seq(
      ("p", "P", "k", "a"), ("p", "P", "k", "b"),
      ("p", "P", "k", "a"), ("p", "P", "k", "b"),
      ("q", "Q", "k", "c"), ("q", "Q", "k", "d"),
      ("q", "Q", "k", "c"), ("q", "Q", "k", "d"))
      .toDF("t", "copy", "noise", "half")
    val got = Transforms.infoGainRanking(rows,
        Seq("copy", "noise", "half"), "t")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got("copy") === ((693L, 2L)))
    assert(got("noise") === ((0L, 2L)))
    assert(got("half") === ((693L, 4L)))
  }

  test("fellegiSunter: hand pairs — exact weight sums, blocking, filter") {
    // one block 'B': ids 1,2,3. Fields: name equal (m=.9,u=.1 →
    // wa=ln(9)=+2197225 micros, wd=ln(1/9)=-2197225), size equal
    // (m=.9,u=.2 → wa=ln(4.5)=+1504077, wd=ln(.125)=-2079442).
    // Pair (1,2): both agree → 3701302, n_agree 2. Pair (1,3)/(2,3):
    // name disagrees, size agrees → -693148 → filtered by minScore 0.
    // Block 'C' id 4 pairs with nobody.
    val (waN, wdN) = Dedup.fsWeightsMicro(0.9, 0.1)
    val (waS, wdS) = Dedup.fsWeightsMicro(0.9, 0.2)
    assert((waN, wdN) === ((2197225L, -2197225L)))
    assert((waS, wdS) === ((1504077L, -2079442L)))
    val recs = Seq((1L, "B", "acme", 10), (2L, "B", "acme", 10),
      (3L, "B", "zeta", 10), (4L, "C", "acme", 10))
      .toDF("id", "blk", "nm", "sz")
    val got = Dedup.fellegiSunter(recs, "blk", "id", Seq(
        (col("x.nm") === col("y.nm"), 0.9, 0.1),
        (col("x.sz") === col("y.sz"), 0.9, 0.2)),
        minScoreMicro = 0L)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq((1L, 2L, waN + waS, 2L)))
    // lowering the floor admits the half-agreeing pairs at exact scores
    val all = Dedup.fellegiSunter(recs, "blk", "id", Seq(
        (col("x.nm") === col("y.nm"), 0.9, 0.1),
        (col("x.sz") === col("y.sz"), 0.9, 0.2)),
        minScoreMicro = Long.MinValue)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(all === Seq((1L, 2L, waN + waS, 2L),
      (1L, 3L, wdN + waS, 1L), (2L, 3L, wdN + waS, 1L)))
  }
}
