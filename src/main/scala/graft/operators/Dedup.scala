package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard (exact near-dup), MinHash+LSH (approximate near-dup at
  * scale), SimHash, and embedding-cosine near-dup.
  *
  * Scale shapes:
  *  - exact dedup = one hash-aggregate shuffle on the text hash (never the
  *    raw text — a 64-bit key shuffles, the document bodies stay put);
  *  - n-gram Jaccard = inverted-index self-join on shingles (exact, but
  *    join fan-out grows with shingle collision rate — use for verification
  *    or modest corpora);
  *  - MinHash+LSH = the 100 TB path: per-doc signature (one aggregate),
  *    banding (explode k/r band keys), bucket self-join (only within-band
  *    collisions meet), then exact-Jaccard verification of the candidates
  *    only. No all-pairs stage anywhere.
  */
object Dedup {

  /** Word shingles (n-grams of the whitespace token stream), distinct per
    * doc. 5-grams by default: long enough that random collisions are rare
    * even in small vocabularies. */
  def shingles(text: Column, n: Int = 5): Column = {
    val w = split(lower(trim(text)), "\\s+")
    val idx = sequence(lit(0), size(w) - lit(n))
    when(size(w) >= n,
      array_distinct(transform(idx, i =>
        concat_ws(" ", (0 until n).map(j => element_at(w, i + lit(j + 1))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: one survivor (min id) per distinct text. The group key is
    * xxhash64(text) so the shuffle moves 8-byte keys; survivors keep the
    * full row via min-by-id within the hash group. */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("__th"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Exact n-gram-Jaccard near-dup pairs via inverted shingle index:
    * doc→shingle explode, self-join on shingle, common-count per pair,
    * jaccard = common / (|A| + |B| − common) ≥ threshold. Returns
    * (a, b, jacc_permille) with a < b. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 5, thresholdPermille: Int = 100): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val inv = sh.select(col("id"), col("nsh"), explode(col("sh")).as("s"))
    val pairs = inv.as("x").join(inv.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"),
        col("x.nsh").as("na"), col("y.nsh").as("nb"))
      .agg(count(lit(1)).as("common"))
    pairs
      .withColumn("jacc_permille",
        round(col("common") * lit(1000.0) /
          (col("na") + col("nb") - col("common"))).cast("long"))
      .filter(col("jacc_permille") >= thresholdPermille)
      .select("a", "b", "jacc_permille")
  }

  private def hashFn(i: Int, c: Column): Column =
    xxhash64(lit(i), c)

  /** Per-doc MinHash signature: k independent min-hashes over the shingle
    * set, computed in ONE aggregation (k min() columns), not k passes. */
  def minhashSignature(df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, n: Int = 5): DataFrame = {
    val inv = df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), n)).as("s"))
    inv.groupBy("id")
      .agg(min(hashFn(0, col("s"))).as("h0"),
        (1 until k).map(i => min(hashFn(i, col("s"))).as(s"h$i")): _*)
  }

  /** MinHash + LSH banding: signatures → (band, bandHash) keys → bucket
    * self-join → candidate pairs → exact verification left to caller (or
    * [[ngramJaccardPairs]] on the candidate subset). r rows/band; docs
    * agreeing on all r hashes of any band collide. Returns distinct
    * candidate pairs (a < b). */
  def minhashLshCandidates(sigs: DataFrame, k: Int = 64, r: Int = 4): DataFrame = {
    val bands = k / r
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until r).map(i => col(s"h${b * r + i}")): _*).as("bh"))
    }
    val keyed = sigs.select(col("id"), explode(array(bandCols: _*)).as("bk"))
    keyed.as("x").join(keyed.as("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** SimHash (64-bit): per-token hash votes weighted ±1 per bit, sign →
    * bit. Near-dups have small Hamming distance. One explode + one
    * aggregate with 64 sum columns — single shuffle on doc id. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.wsTokens(lower(col(textCol)))).as("w"))
    val h = xxhash64(col("w"))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"v$b")
    }
    tok.groupBy("id").agg(votes.head, votes.tail: _*)
      .select(col("id"), (0 until 64).map { b =>
        when(col(s"v$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Embedding-cosine near-dup pairs ≥ threshold (exact, all-pairs — the
    * verification-grade path; use [[Similarity.lshBuckets]] to pre-bucket at
    * scale). Cosine in double; emitted as permille for exact compares. */
  def embeddingCosinePairs(df: DataFrame, vecCol: String, idCol: String,
      thresholdPermille: Int): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val a = v.as("x"); val b = v.as("y")
    a.join(b, col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        Similarity.cosinePermille(col("x.v"), col("y.v")).as("cos_permille"))
      .filter(col("cos_permille") >= thresholdPermille)
  }
}
