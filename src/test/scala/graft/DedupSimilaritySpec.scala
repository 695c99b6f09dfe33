package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (3L, "completely different words about spark catalyst optimizer plans here"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today")
  ).toDF("doc_id", "text")

  test("exact dedup keeps one survivor per distinct text") {
    val got = Dedup.exactSurvivors(docs, "text", "doc_id")
      .as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L)) // 4 is an exact dup of 1
  }

  test("ngram jaccard finds near-dups, not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, thresholdPermille = 500)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // identical
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("BoundedIntersect: exact count when reachable, -1 abort, and " +
      "parity with array_intersect on random sorted sets") {
    import graft.functions.BoundedIntersect
    val rows = Seq(
      (Array(1L, 3L, 5L), Array(1L, 3L, 5L), 3L),   // full overlap
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 1L),   // disjoint, bound 1
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 0L),   // bound 0 never aborts
      (Array(1L, 2L, 3L, 4L), Array(3L, 4L), 2L),   // subset tail
      (Array.empty[Long], Array(1L), 0L),           // empty side
      (Array(1L), Array(1L), 2L)                    // unreachable bound
    ).toDF("a", "b", "m")
    val got = rows.select(BoundedIntersect(col("a"), col("b"), col("m")))
      .as[Long].collect().toSeq
    assert(got === Seq(3L, -1L, 0L, 2L, 0L, -1L))
    // randomized parity: whenever the walk returns >= 0 it must equal
    // size(array_intersect); when it returns -1 the true count must be
    // below the bound (the abort is never wrong)
    val rnd = new scala.util.Random(7)
    val rand = Seq.fill(300) {
      val a = (1 to rnd.nextInt(20)).map(_ => rnd.nextInt(30).toLong)
        .distinct.sorted.toArray
      val b = (1 to rnd.nextInt(20)).map(_ => rnd.nextInt(30).toLong)
        .distinct.sorted.toArray
      (a, b, rnd.nextInt(10).toLong)
    }.toDF("a", "b", "m")
    val chk = rand.select(col("m"),
        BoundedIntersect(col("a"), col("b"), col("m")).as("bi"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("tr"))
      .as[(Long, Long, Long)].collect()
    chk.foreach { case (m, bi, tr) =>
      if (bi >= 0L) assert(bi === tr, s"bound $m")
      else assert(tr < m, s"wrong abort: true $tr >= bound $m")
    }
  }

  test("prefix-filter jaccard == brute-force exact pairs (lossless pruning)") {
    // randomized corpus from a small vocab so overlaps span the whole
    // jaccard range; the prefix join must reproduce the brute-force
    // threshold join EXACTLY at several thresholds (the filter only
    // prunes candidate GENERATION, never results).
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    val corpus = (1L to 40L).map { id =>
      val n = 4 + rnd.nextInt(12)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = corpus.toDF("doc_id", "text")
    val sets = corpus.map { case (id, t) =>
      id -> t.split("\\s+").map(_.toLowerCase).toSet }.toMap
    for (thr <- Seq(100, 300, 500, 800)) {
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        common = (sets(a) & sets(b)).size
        jp = math.round(common * 1000.0 / (sets(a).size + sets(b).size - common))
        if jp >= thr
      } yield (a, b, jp)).toSet
      val got = Dedup.prefixFilterJaccardPairs(df, "text", "doc_id", thr)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === want, s"threshold $thr")
    }
  }

  test("prefix filter indexes strictly fewer rows than the full index") {
    // the scale claim: at t=0.9 only ~10% of each doc's tokens (its
    // rarest) enter the join; verify the prefix relation really is the
    // small sliver and high-df tokens are the ones excluded.
    val df = docs
    val words = df.select(col("doc_id").as("id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .distinct()
    val full = words.count()
    // reproduce the operator's prefix arithmetic at thr=900
    val dfreq = words.groupBy("w").agg(count(lit(1)).as("df"))
    import org.apache.spark.sql.expressions.Window
    val ranked = words.join(dfreq, "w")
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy(col("df").asc, col("w").asc)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("id")))
    val prefix = ranked.filter(col("rnk") <=
      col("n") - expr("(n * 1799 + 1999) DIV 2000") + lit(1))
    assert(prefix.count() < full / 2)
    // 'the' (df = 3 of 4 docs here) must not be anyone's prefix token
    // unless the doc is tiny; doc 3 has all-unique words so its prefix
    // is its rarest token only
    val doc3prefix = prefix.filter(col("id") === 3L).count()
    assert(doc3prefix >= 1 && doc3prefix <= 2)
  }

  test("connectedComponents: path, triangle, pair — min-id labels, multi-hop") {
    // path 1-2-3-4-5 forces 4 propagation hops; triangle + isolated pair
    // alongside prove components don't bleed into each other
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), // path, mixed edge order
      (20L, 21L), (21L, 22L), (20L, 22L),     // triangle
      (10L, 11L))                             // pair
      .toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      10L -> 10L, 11L -> 10L))
    // non-participants are absent, not singletons
    assert(!got.contains(6L))
    // a too-small iteration cap fails loudly instead of mislabeling
    intercept[IllegalArgumentException] {
      Dedup.connectedComponents(pairs, maxIter = 1)
    }
  }

  test("simhash_pairs banding == direct all-pairs hamming at d<=4") {
    import org.apache.spark.sql.functions.{bit_count, col}
    val dir = "/root/testdata/sf0.001"
    val banded = SparkEntry.queries("simhash_pairs")(spark, dir)
      .select("a", "b", "hamming").as[(Long, Long, Long)].collect().toSet
    val h = Dedup.simhash(
      spark.read.parquet(s"$dir/documents.parquet"), "text", "doc_id")
    val direct = h.as("x").join(h.as("y"),
        col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .cast("long"))
      .as[(Long, Long, Long)].collect().filter(_._3 <= 4).toSet
    assert(banded === direct)
    assert(direct.nonEmpty, "fixture should contain simhash near-dups")
  }

  test("connectedComponents: 200-node chain converges (pointer jumping)") {
    // plain hash-min needs diameter rounds (200 here — over any sane
    // bound); the shortcut self-join must close this in O(log n) rounds.
    // This is the Borůvka-forest shape that broke at sf0.1.
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val labs = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(labs.size === 200)
    assert(labs.values.toSet === Set(0L))
  }

  test("minhash LSH candidates cover the true near-dup pairs (recall)") {
    val sigs = Dedup.minhashSignature(docs, "text", "doc_id", k = 64, n = 3)
    val cand = Dedup.minhashLshCandidates(sigs, k = 64, r = 4)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 4L))) // identical → all bands agree
    assert(cand.contains((1L, 2L))) // 12/13 shingles shared → near-certain
  }

  test("LSH candidates + exact verify = exact pairs restricted to candidates") {
    val sigs = Dedup.minhashSignature(docs, "text", "doc_id", k = 64, n = 3)
    val cand = Dedup.minhashLshCandidates(sigs, k = 64, r = 4)
    val verified = Dedup
      .verifyCandidates(docs, cand, "text", "doc_id", n = 3,
        thresholdPermille = 500)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val exactAll = Dedup
      .ngramJaccardPairs(docs, "text", "doc_id", n = 3,
        thresholdPermille = 500)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val candSet = cand.as[(Long, Long)].collect().toSet
    // verified == exact ∩ candidates, with IDENTICAL jaccard values
    assert(verified === exactAll.filter { case (p, _) => candSet(p) })
    // and the near-dup pair the recall test guarantees is present survives
    assert(verified.contains((1L, 4L)))
  }

  test("minhash LSH bucket cap drops only the degenerate buckets") {
    val sigs = Dedup.minhashSignature(docs, "text", "doc_id", k = 64, n = 3)
    val uncapped = Dedup.minhashLshCandidates(sigs, k = 64, r = 4)
      .collect().toSet
    // cap far above any real bucket: identical results
    val high = Dedup.minhashLshCandidates(sigs, k = 64, r = 4, maxBucket = 1000)
      .collect().toSet
    assert(high === uncapped)
    // cap of 1: every multi-member bucket dropped -> no candidates at all
    val one = Dedup.minhashLshCandidates(sigs, k = 64, r = 4, maxBucket = 1)
    assert(one.count() === 0)
  }

  test("incremental dedup: seen content excluded, within-batch dups collapse") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val batch = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"))
      .toDF("doc_id", "text")
    val seen = Dedup.seenHashes(
      Seq((99L, "bbb")).toDF("doc_id", "text"), "text")
    val out = Dedup.incrementalExactSurvivors(batch, seen, "text", "doc_id")
      .as[Long].collect().toSet
    // "bbb" already seen; "aaa" collapses to min id 1; "ccc" new
    assert(out === Set(1L, 4L))
    // empty state: everything (deduped) survives
    val none = Dedup.seenHashes(batch.filter(col("doc_id") < 0), "text")
    assert(Dedup.incrementalExactSurvivors(batch, none, "text", "doc_id")
      .count() === 3)
  }

  test("bloom-pruned incremental dedup: identical to plain form, FP-proof, empty state") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val batch = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"))
      .toDF("doc_id", "text")
    val seen = Dedup.seenHashes(
      Seq((99L, "bbb")).toDF("doc_id", "text"), "text")
    val out = Dedup.bloomPrunedIncrementalSurvivors(batch, seen, "text", "doc_id")
      .as[Long].collect().toSet
    assert(out === Set(1L, 4L))
    // empty state short-circuits: everything (deduped) survives
    val none = Dedup.seenHashes(batch.filter(col("doc_id") < 0), "text")
    assert(Dedup.bloomPrunedIncrementalSurvivors(batch, none, "text", "doc_id")
      .count() === 3)
    // a deliberately under-sized filter (1 expected item for a 300-entry
    // state) floods the maybe-seen branch with false positives — the exact
    // anti-join must still verify them all away: output identical to the
    // plain form on a larger corpus
    val docs = (1L to 400L).map(i => (i, s"doc number ${i % 350}"))
      .toDF("doc_id", "text")
    val state = Dedup.seenHashes(docs.filter(col("doc_id") % 3 === 0), "text")
    val plain = Dedup.incrementalExactSurvivors(docs, state, "text", "doc_id")
      .as[Long].collect().toSet
    val tiny = Dedup.bloomPrunedIncrementalSurvivors(docs, state, "text",
      "doc_id", expectedItems = 1L)
      .as[Long].collect().toSet
    assert(tiny === plain)
  }

  test("benchmarkContamination: verbatim leak found, gram/doc counts exact") {
    import spark.implicits._
    val leak = "one two three four five six seven eight nine ten"
    val train = Seq(
      (1L, s"prefix words then $leak and a tail"), // contains the leaked span
      (2L, "totally unrelated training content with many distinct words here"),
      (3L, s"$leak")                               // the bare benchmark text
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, leak),
      (101L, "another benchmark item that nothing in training shares at all"))
      .toDF("doc_id", "text")
    val got = Dedup.benchmarkContamination(train, bench, "text", "doc_id", n = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // doc 1: the 10-token leak span yields 3 distinct 8-grams, all from
    // bench doc 100; doc 3 carries the same 3; doc 2 is clean
    assert(got === Map(1L -> ((3L, 1L)), 3L -> ((3L, 1L))))
  }

  test("simhash: identical texts equal, near-dups close, unrelated far") {
    val sh = Dedup.simhash(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(4L))
    val near = java.lang.Long.bitCount(sh(1L) ^ sh(2L))
    val far = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(near < far, s"near=$near far=$far")
  }

  test("ann LSH recall vs brute force on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.annTopK(q, c, 5, nPlanes = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // 4 planes ⇒ 1/16 corpus scanned
    // every approx hit must be a real neighbor pair ranked by true cosine:
    assert(approx.forall { case (qid, _) => exact.exists(_._1 == qid) })
  }

  test("ann IVF recall vs brute force on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.annTopKIvf(q, c, 5, nCells = 8, nProbe = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // 3/8 of corpus probed
    assert(approx.size === 25) // full top-5 for each of 5 queries
  }

  test("stored IVF index: serve path == inline retrain path bit-exactly; " +
      "maintained assignments == rebuild on the post-delta corpus") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val reg = new graft.state.ModelRegistry(spark,
      java.nio.file.Files.createTempDirectory("graft-ann-spec").toString)
    val v1 = Similarity.ivfPublish(c, reg, "ivf", nCells = 8)
    assert(v1 === 1L)
    val pin = reg.snapshot("ivf")
    // the stored artifact serves bit-identically to computing the index
    // inline (assignment is integer-exact; parquet round-trips it) — so
    // the brute-force recall receipt of the inline path carries over
    val stored = Similarity.annTopKIvfStored(q, c, 5, pin, nProbe = 3)
      .as[(Long, Long, Long)].collect().toSet
    val inline = Similarity.annTopKIvf(q, c, 5, nCells = 8, nProbe = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === inline)

    // IVM contract: maintain under adds + retracts against the FROZEN
    // centroids == re-assign the post-delta corpus from scratch
    val base = emb.filter(col("id") % 3 < 2)
    val Seq((_, cents), (_, assigns)) =
      Similarity.ivfIndexTables(base, nCells = 8)
    val delta = emb.filter(col("id") % 3 === 2)
      .withColumn("__op", lit(1))
      .unionByName(base.filter(col("id") % 5 === 0)
        .withColumn("__op", lit(-1)))
    val maintained = Similarity.ivfMaintainAssignments(assigns, delta,
        cents, "__op")
      .as[(Long, Long)].collect().toSet
    val postDelta = emb.filter(col("id") % 3 === 2)
      .unionByName(base.filter(col("id") % 5 =!= 0))
    // rebuild with the SAME frozen centroid table (not re-seeded from
    // the post-delta corpus — retraining is a new index version)
    val rebuilt = Similarity.ivfMaintainAssignments(
        assigns.limit(0), postDelta.withColumn("__op", lit(1)), cents,
        "__op")
      .as[(Long, Long)].collect().toSet
    assert(maintained === rebuilt)
    assert(maintained.nonEmpty)
  }

  test("stored IVF-PQ and SQ8 indexes: serve path == inline retrain " +
      "path bit-exactly (registry round-trip for the compressed tiers)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val reg = new graft.state.ModelRegistry(spark,
      java.nio.file.Files.createTempDirectory("graft-annpq-spec").toString)

    // IVF-PQ: the whole compressed index (centroids, codebook, codes,
    // build params) publishes as ONE version; ADC distances and the
    // exact rerank are integer-exact, parquet round-trips the doubles
    // bit-for-bit, so stored serve == inline retrain
    assert(Similarity.ivfPqPublish(c, reg, "ivfpq", nCells = 8,
      nSub = 8, nCentroids = 64) === 1L)
    val pqPin = reg.snapshot("ivfpq")
    val pqStored = Similarity.annTopKIvfPqStored(q, c, 5, pqPin,
        nProbe = 3, rerank = 25)
      .as[(Long, Long, Long)].collect().toSet
    val pqInline = Similarity.annTopKIvfPq(q, c, 5, nCells = 8,
        nProbe = 3, nSub = 8, nCentroids = 64, rerank = 25)
      .as[(Long, Long, Long)].collect().toSet
    assert(pqStored === pqInline)
    assert(pqStored.nonEmpty)

    // the meta table makes the artifact self-describing: serve reads
    // nSub/dim from the pinned version, not from caller arguments
    assert(pqPin.table("meta").select("n_sub", "dim")
      .as[(Int, Int)].collect().toSeq === Seq((8, 64)))

    // SQ8: bounds learned at publish time are THE model — the serve
    // path quantizes the new batch with the pinned bounds and scores
    // against the pinned code table
    assert(Similarity.sq8Publish(c, reg, "sq8") === 1L)
    val sqStored = Similarity.annTopKSq8Stored(q, c, 5,
        reg.snapshot("sq8"))
      .as[(Long, Long, Long)].collect().toSet
    val sqInline = Similarity.annTopKSq8(q, c, 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(sqStored === sqInline)
    assert(sqStored.nonEmpty)
  }

  test("compressed-tier code maintenance: maintained IVF-PQ and SQ8 " +
      "code tables == from-scratch re-encode of the post-delta corpus " +
      "against the same frozen artifacts") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val base = emb.filter(col("id") % 3 < 2)
    val delta = emb.filter(col("id") % 3 === 2)
      .withColumn("__op", lit(1))
      .unionByName(base.filter(col("id") % 5 === 0)
        .withColumn("__op", lit(-1)))
    val postDelta = emb.filter(col("id") % 3 === 2)
      .unionByName(base.filter(col("id") % 5 =!= 0))
    val reg = new graft.state.ModelRegistry(spark,
      java.nio.file.Files.createTempDirectory("graft-ivm-spec").toString)

    // IVF-PQ: encode is per-row against frozen centroids + codebook,
    // so state − retracts + encoded adds == full re-encode
    Similarity.ivfPqPublish(base, reg, "ivfpq", nCells = 8, nSub = 8,
      nCentroids = 64)
    val pqPin = reg.snapshot("ivfpq")
    val pqMaintained = Similarity.ivfPqMaintainCodes(
        pqPin.table("codes"), delta, pqPin, "__op")
      .as[(Long, Long, Int, Long)].collect().toSet
    val pqRebuilt = Similarity.ivfPqMaintainCodes(
        pqPin.table("codes").limit(0),
        postDelta.withColumn("__op", lit(1)), pqPin, "__op")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(pqMaintained === pqRebuilt)
    assert(pqMaintained.nonEmpty)

    // SQ8: quantization is per-row against the frozen bounds
    Similarity.sq8Publish(base, reg, "sq8")
    val sqPin = reg.snapshot("sq8")
    val sqMaintained = Similarity.sq8MaintainCodes(
        sqPin.table("codes"), delta, sqPin, "__op")
      .as[(Long, Array[Double], Double)].collect()
      .map(r => (r._1, r._2.toSeq, r._3)).toSet
    val sqRebuilt = Similarity.sq8MaintainCodes(
        sqPin.table("codes").limit(0),
        postDelta.withColumn("__op", lit(1)), sqPin, "__op")
      .as[(Long, Array[Double], Double)].collect()
      .map(r => (r._1, r._2.toSeq, r._3)).toSet
    assert(sqMaintained === sqRebuilt)
    assert(sqMaintained.nonEmpty)
  }

  test("cluster mixture: batch stage == declared JSON stage == frozen " +
      "streaming gate on the same corpus") {
    val embPath = "/root/testdata/sf0.001/embeddings.parquet"
    val emb = spark.read.parquet(embPath)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val docs = emb.select(col("id").as("doc_id"),
      concat(lit("payload-"), col("id")).as("text"))

    // WAY 1: the operator called by hand
    val batch = Similarity.clusterMixture(docs, "doc_id", emb,
      nCells = 8, alpha = 0.3)
    val batchIds = batch.select("doc_id").as[Long].collect().toSet

    // WAY 2: the declared JSON stage
    val stage = graft.pipeline.SpecLoader.stagesFromJson(
      s"""{"name": "cm", "steps": [
         |  {"op": "cluster_mixture", "id": "doc_id",
         |   "vec_dir": "$embPath", "n_cells": 8, "alpha": 0.3}]}"""
        .stripMargin).head._2
    val declared = stage(docs)
    assert(declared.columns.toSeq === docs.columns.toSeq,
      "stage output schema must equal input schema")
    assert(declared.select("doc_id").as[Long].collect().toSet ===
      batchIds)

    // WAY 3: the frozen streaming gate — centroids and rates trained
    // once on the same corpus, then per-row local assignment + hash
    val Seq((_, cents), (_, assigns)) =
      Similarity.ivfIndexTables(emb, nCells = 8)
    val fc = Similarity.freezeCentroids(cents)
    val rates = graft.operators.TextAnalysis.alphaRatesPpm(
        assigns.select(col("nid"), col("cid")), col("cid"), 0.3)
      .as[(Long, Long)].collect().toMap
    val streamed = graft.streaming.StreamingClusterGate.gate(
        docs.join(emb.select(col("id").as("doc_id"), col("vec")
          .cast("array<double>")), Seq("doc_id")),
        "vec", "doc_id", fc, rates)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batchIds)

    // the fixture exercises the balance: something kept, something cut
    assert(batchIds.nonEmpty && batchIds.size < docs.count())

    // local assignment is bit-identical to the distributed argmax on
    // every corpus vector (the frozen-twin contract)
    val distributed = assigns.select(col("nid"), col("cid"))
      .as[(Long, Long)].collect().toMap
    emb.select(col("id"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])].collect().foreach { case (id, v) =>
        assert(Similarity.assignLocal(v, fc) === distributed(id),
          s"vec $id")
      }

    // degenerate embeddings fail LOUDLY in the local twin, matching the
    // batch stage's ANSI DIVIDE_BY_ZERO — never a bare
    // NumberFormatException out of BigDecimal.valueOf(NaN), and never a
    // silent divergence (crash on one side, drop/assign on the other)
    assert(intercept[IllegalArgumentException](
      Similarity.assignLocal(Array(0.0, 0.0, 0.0), fc)).getMessage
      .contains("zero-norm"))
    assert(intercept[IllegalArgumentException](
      Similarity.assignLocal(Array(Double.NaN, 1.0), fc)).getMessage
      .contains("cosine direction"))
  }

  test("ann IVF-PQ: ADC ranking recalls brute-force neighbors") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annTopKIvf(q, c, 5, nCells = 8, nProbe = 3)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val pq = Similarity.annTopKIvfPq(q, c, 5, nCells = 8, nProbe = 3,
        nSub = 8, nCentroids = 128, rerank = 25)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = exact.count(pq.contains).toDouble / exact.size
    val ivfRecall = exact.count(ivf.contains).toDouble / exact.size
    // IVFADC+R discipline: the 25-deep exact re-rank recovers what the
    // coarse 128-code quantizer blurs, so recall must sit at (or within
    // one neighbor-set of) the IVF tier scanning the same probed cells
    assert(recall >= ivfRecall - 0.08,
      s"recall=$recall vs ivf=$ivfRecall")
    assert(recall >= 0.2, s"recall=$recall")
    assert(pq.size === 25, "full top-5 for each of 5 queries")
  }

  test("ann SQ8: code distance recalls brute-force; full-depth rerank is exact") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val n = c.count().toInt
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val sq = Similarity.annTopKSq8(q, c, 5, rerank = 25)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    // 8-bit symmetric distance on unit vectors is a tight cosine proxy:
    // a 25-deep shortlist should recall most of the true top-5
    val recall = exact.count(sq.contains).toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    assert(sq.size === 25, "full top-5 for each of 5 queries")
    // rerank depth = |corpus| makes the shortlist the whole corpus, so
    // the exact-cosine rerank must reproduce brute force EXACTLY
    val full = Similarity.annTopKSq8(q, c, 5, rerank = n)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(full === exact)
  }

  test("rrfFusion: agreeing tiers reproduce the exact order; micros formula") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val fused = Similarity.rrfFusion(q, c, 5, kRrf = 60)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(fused.length === 25, "full top-5 for each of 5 queries")
    // the formula is pinned: rrf = 10⁶ DIV (60+ra) + 10⁶ DIV (60+rb)
    fused.foreach { case (_, _, ra, rb, rrf) =>
      assert(rrf === 1000000L / (60 + ra) + 1000000L / (60 + rb))
    }
    // both tier ranks are attached and positive; fused top-5 recalls
    // most of the exact top-5 (the SQ8 tier is a tight cosine proxy)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ids = fused.map(r => (r._1, r._2)).toSet
    val recall = exact.count(ids.contains).toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    // a pair ranked #1 by BOTH tiers must be fused #1 for its query
    fused.groupBy(_._1).foreach { case (_, rows) =>
      rows.find(r => r._3 == 1L && r._4 == 1L).foreach { both =>
        assert(rows.maxBy(_._5)._5 === both._5)
      }
    }
  }

  test("IVF with trained centroids: valid top-k, recall not worse than sampled") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 5)
    val c = emb.filter(col("id") >= 5)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet

    val trained = Similarity.trainCentroids(c, nCells = 8, iters = 2)
    assert(trained.count() <= 8)
    assert(trained.select("vec").head().getSeq[Double](0).length ===
      c.select("vec").head().getSeq[Float](0).length)

    def recallOf(cents: Option[org.apache.spark.sql.DataFrame]): Double = {
      val approx = Similarity
        .annTopKIvf(q, c, 5, nCells = 8, nProbe = 3, centroids = cents)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
      assert(approx.size === 25)
      exact.count(approx.contains).toDouble / exact.size
    }
    val rSampled = recallOf(None)
    val rTrained = recallOf(Some(trained))
    // trained cells should not LOSE recall vs arbitrary sampled seeds
    // (allow one-neighbor slack for tie reshuffling at equal similarity)
    assert(rTrained >= rSampled - 0.04, s"trained=$rTrained sampled=$rSampled")
  }

  test("embeddingCosineLsh: strict subset of all-pairs with identical cosines, high recall on near-dups") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val all = Dedup.embeddingCosinePairs(
        emb.select(col("id"), col("vec"), lit(0).as("label")),
        "vec", "id", thresholdPermille = 300)
      .select("a", "b", "cos_permille").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Dedup.embeddingCosineLsh(emb, "vec", "id",
        thresholdPermille = 300)
      .select("a", "b", "cos_permille").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // subset with IDENTICAL exact-cosine values (LSH only restricts
    // candidates; it never changes the score of a surviving pair)
    lsh.foreach { case (p, cos) => assert(all.get(p).contains(cos)) }
    // SRP recall concentrates on the closest pairs: every pair the
    // all-pairs tier scores ≥ 900 permille (θ ≤ ~26°, same-bucket
    // probability ≥ (1 − θ/π)^6 ≈ 0.6 per pair) — demand the aggregate
    // recall there, and nontrivial recall overall.
    val hot = all.filter(_._2 >= 900)
    if (hot.nonEmpty) {
      val hotRecall = hot.keys.count(lsh.contains).toDouble / hot.size
      assert(hotRecall >= 0.4, s"hot recall=$hotRecall of ${hot.size}")
    }
    if (all.nonEmpty) {
      val recall = all.keys.count(lsh.contains).toDouble / all.size
      assert(recall > 0.0, s"recall=$recall of ${all.size}")
    }
  }

  test("embedding cosine pairs: self-similarity sanity") {
    val two = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(1.0f, 0.001f, 0.0f), 0),
      (3L, Seq(0.0f, 1.0f, 0.0f), 0)).toDF("id", "vec", "label")
    val pairs = Dedup.embeddingCosinePairs(two, "vec", "id", 950)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("semDedup: first in-cell member of a neighborhood survives") {
    // Centroids = 2 lowest ids: c0=(1,0), c1=(0,1).
    //  id 2 (0.99,0.14): cell 0, cos(0,2)≈990 ≥ 900 → pruned by 0.
    //  id 3 (0.6,0.8):   cell 1 (cos 800 > 600), cos(1,3)=800 < 900 → kept.
    //  id 4 (0.58,0.815): cell 1, cos(3,4)≈1000 → pruned by 3.
    //  id 6 (1,1): cos 707 to BOTH centroids → lowest-cid tie-break
    //    (cell 0); no earlier in-cell member ≥ 900 → kept.
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(0.99f, 0.14f)),
      (3L, Seq(0.6f, 0.8f)), (4L, Seq(0.58f, 0.815f)), (6L, Seq(1f, 1f)))
      .toDF("id", "vec")
    val got = Similarity.semDedup(vecs, nCells = 2,
        thresholdPermille = 900)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      0L -> ((0L, 0L)), 1L -> ((1L, 0L)), 2L -> ((0L, 1L)),
      3L -> ((1L, 0L)), 4L -> ((1L, 1L)), 6L -> ((0L, 0L))))
  }

  test("semDedup: k-means fallback beyond the centroid cap keeps " +
      "first-member semantics") {
    // 16 vectors, two tight cosine clusters (ids alternate so the k-means
    // seeds — the 2 lowest ids — start one per cluster). centroidCap=2,
    // targetMeanCell=2 ⇒ n (16) >= cap·tmc (4): the derived-cell path
    // must take the k-means fallback, not the lowest-id shortcut. The
    // semantics contract is unchanged: within each cell the lowest-id
    // member of a ≥-threshold neighborhood survives, later members prune.
    val vecs = (0 until 16).map { i =>
      val eps = 0.001f * i
      if (i % 2 == 0) (i.toLong, Seq(1f, eps)) else (i.toLong, Seq(eps, 1f))
    }.toDF("id", "vec")
    val got = Similarity.semDedup(vecs, nCells = 0, thresholdPermille = 900,
        targetMeanCell = 2, centroidCap = 2)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 16)
    // two cells, split exactly along the two cosine clusters
    val cellOf = got.map(r => r._1 -> r._2).toMap
    val cellA = (0 until 16 by 2).map(i => cellOf(i.toLong)).toSet
    val cellB = (1 until 16 by 2).map(i => cellOf(i.toLong)).toSet
    assert(cellA.size === 1 && cellB.size === 1 && cellA != cellB,
      s"clusters not separated: $cellOf")
    // first member of each cluster survives, every later member prunes
    val kept = got.filter(_._3 == 0L).map(_._1).toSet
    assert(kept === Set(0L, 1L), s"kept=$kept")
  }

  test("lsh_tuning: S-curve is monotone in similarity and in rows-per-band") {
    // Fixed-point contract checks on the real fixture: probabilities stay
    // in [0,1000]; within a config, higher-similarity deciles can only
    // raise the candidate probability; at fixed signature budget k=128,
    // fewer rows per band (r2 vs r16) can only raise it.
    val rows = SparkEntry.queries("lsh_tuning")(spark,
        "/root/testdata/sf0.001")
      .orderBy("decile")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, a, b, c, d) =>
      assert(n > 0)
      Seq(a, b, c, d).foreach(p => assert(p >= 0L && p <= 1000L))
      assert(a >= b && b >= c && c >= d)
    }
    rows.sliding(2).foreach {
      case Array((d1, _, a1, b1, c1, e1), (d2, _, a2, b2, c2, e2)) =>
        assert(d1 < d2)
        assert(a2 >= a1 && b2 >= b1 && c2 >= c1 && e2 >= e1)
      case _ =>
    }
  }

  /** Synthetic entity-resolution corpus: `n` rows in `nBlocks` blocking
    * keys, names drawn from a small template set with id-keyed edits so
    * both near-dup (within edit distance) and far pairs exist, and the
    * truth/blocked recall relationship is non-trivial. Deterministic. */
  private def fuzzyCorpus(n: Int, nBlocks: Int) = {
    val stems = Vector("linen azure tomato", "metallic rose chiffon",
      "powder navy cornsilk", "burnished olive drab")
    (0 until n).map { i =>
      val stem = stems((i * 7) % stems.size)
      // id-keyed single-char edit for every third row → clusters of
      // near-dups within levenshtein 4, mixed with unrelated stems
      val name = if (i % 3 == 0) stem + " " + ("x" * (i % 3 + 1))
        else stem + s" ${i % 5}"
      (s"B${i % nBlocks}", name, i.toLong)
    }.toDF("blk", "name", "id")
  }

  /** Exhaustive recall of the blocked matcher — the quadratic reference
    * the sampled tier estimates. */
  private def exhaustiveRecall(df: org.apache.spark.sql.DataFrame,
      maxDist: Int): (Long, Long) = {
    val found = Dedup.blockedEditDistance(df, "blk", "name", "id",
      maxDist).select(col("a"), col("b"))
    val v = df.select(col("name").as("s"), col("id"))
    val truth = v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .filter(levenshtein(col("x.s"), col("y.s")) <= maxDist)
      .select(col("x.id").as("a"), col("y.id").as("b"))
    (truth.count(),
      truth.join(found, Seq("a", "b"), "left_semi").count())
  }

  test("blockedRecallSampled: on a slice no larger than the anchor cap " +
      "the sampled estimate IS the exhaustive recall (anchor set = " +
      "slice, pair sample = all pairs)") {
    // 60 rows ≤ 128 anchors; 7 blocks (coprime with the 4-stem cycle)
    // scatter near-dup pairs across blocks so blocking is lossy
    val df = fuzzyCorpus(60, 7)
    val (nTruth, nFound) = exhaustiveRecall(df, maxDist = 4)
    assert(nTruth > 0 && nFound < nTruth,
      "fixture must make blocking lossy for the test to bite")
    val row = Dedup.blockedRecallSampled(df, "blk", "name", "id",
        maxDist = 4, nAnchors = 128)
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 === nTruth && row._2 === nFound)
    assert(row._3 === 1000L * nFound / nTruth)
  }

  test("blockedRecallSampled: past the anchor cap the estimate agrees " +
      "with the exhaustive recall within its own confidence half-width, " +
      "and the sample stays linear (|anchors|·n pairs, not n²)") {
    val df = fuzzyCorpus(400, 8)
    val (nTruth, nFound) = exhaustiveRecall(df, maxDist = 4)
    assert(nTruth > 0)
    val exact = 1000.0 * nFound / nTruth
    val row = Dedup.blockedRecallSampled(df, "blk", "name", "id",
        maxDist = 4, nAnchors = 32)
      .as[(Long, Long, Long, Long)].collect().head
    // the sampled truth is a strict subset (32 anchors over 400 rows)
    assert(row._1 > 0 && row._1 < nTruth)
    // deterministic corpus ⇒ this is a fixed number every run: pin the
    // estimator inside its declared half-width of the exhaustive value
    assert(math.abs(row._3 - exact) <= row._4.toDouble,
      s"sampled ${row._3}‰ vs exhaustive $exact‰ exceeds declared " +
        s"half-width ${row._4}‰")
    // exact-integer half-width definition: 1000 DIV floor(sqrt(m))
    assert(row._4 === math.min(1000L,
      1000L / math.floor(math.sqrt(row._1.toDouble)).toLong))
  }
}
