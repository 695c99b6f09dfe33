package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an sf1-scale fixture by 10× key-disjoint replication of the
  * sf0.1 tables — the scale rung between the per-round sf0.1 bench and
  * the 100 TB design target. Re-keying offsets every key-bearing column
  * by a copy stride so joins/groupings keep realistic fan-out (a naive
  * union would multiply duplicate keys 10× and skew every aggregate);
  * value columns are left identical per copy, which is exactly what makes
  * copy-linearity checks meaningful downstream. Usage:
  *   Sf1Gen <outDir> [copies] [zipf]
  *
  * `zipf` mode (the REALISTIC-TEXT rung): document copies i > 0 get
  * NOVEL text — each token independently Zipf(s≈1)-sampled from a
  * 50k-type vocabulary via the inverse-CDF `rank = floor(V^u)` with
  * u = hash(doc_id, pos, copy)/2²⁰-ish — instead of the token-tag
  * jitter. The tag jitter REPEATS every within-copy trigram 10×, so
  * count-floor-pruned LM rungs measured type growth the floor never
  * sees on real crawls (round-12 verdict watch item #1); Zipf novel
  * text is singleton-heavy exactly like crawl text, so the kept set
  * stays near-constant as the corpus grows. Deterministic and
  * seed-stamped (the hash is the seed); token COUNT per doc is
  * preserved from the source text, so length statistics survive. */
object Sf1Gen {
  private val S = 100000000L // key stride between copies
  private val ZipfVocab = 50000

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val copies = if (args.length > 1) args(1).toInt else 10
    val zipf = args.length > 2 && args(2) == "zipf"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = "/root/testdata/sf0.1"

    // key-bearing columns per table (offset by copy stride); every other
    // column passes through unchanged
    val keyCols: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey", "c_nationkey"),
      "supplier" -> Seq("s_suppkey", "s_nationkey"),
      "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    // small dims replicate WITHOUT re-keying (they are genuine dims —
    // nationkey/regionkey references stay valid because customer/supplier
    // nation keys are NOT offset either... they are; so nation/region are
    // simply copied once, and the offset applies only to entity keys)
    val copyOnce = Seq("region", "nation")

    copyOnce.foreach { t =>
      spark.read.parquet(s"$in/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"SF1GEN $t copied")
    }
    // nation/region keys must stay joinable: do NOT offset *_nationkey
    val noOffset = Set("c_nationkey", "s_nationkey")
    keyCols.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$in/$t.parquet")
      val reps = (0 until copies).map { i =>
        val keyed = keys.filterNot(noOffset).foldLeft(df) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * S))
        }
        // documents: perturb text per copy (copy 0 stays byte-identical
        // to sf0.1). Every token gets an ASCII copy tag — an INJECTIVE
        // per-copy token rename, so within-copy shingle/similarity
        // structure is isomorphic to the 1× fixture while cross-copy
        // similarity drops to zero. Without this, every dup clique
        // merges across all copies and pair-output queries (ppjoin,
        // blocking_recall) grow ~copies² in ANSWER volume, which makes
        // the rung measure answer growth instead of plan scaling
        // (round-8 verdict). n_chars is recomputed to stay consistent.
        if (t == "documents" && i > 0 && zipf)
          keyed.withColumn("text", expr(
              ("concat_ws(' ', transform(" +
                "sequence(1, greatest(size(split(trim(text), '\\\\s+')), 3)), " +
                "k -> concat('z', cast(pow(CAST(VOC AS DOUBLE), " +
                "pmod(xxhash64(doc_id, k, COPY), 1048576) / 1048576.0) " +
                "AS INT))))")
                .replace("VOC", ZipfVocab.toString)
                .replace("COPY", i.toString)))
            .withColumn("n_chars", length(col("text")).cast("long"))
        else if (t == "documents" && i > 0)
          keyed.withColumn("text", expr(
              ("concat_ws(' ', transform(split(trim(text), '\\\\s+'), " +
                "x -> concat(x, '~COPY')))").replace("COPY", i.toString)))
            .withColumn("n_chars", length(col("text")).cast("long"))
        // embeddings: deterministic per-(copy, vec, dim) jitter of half
        // the component stddev (±0.0625 on ~N(0, 0.125) coords; copy 0
        // stays byte-identical). Exact replicas made every ANN rung
        // trivial — each query's true top-k was its own copies, which
        // co-bucket under ANY hash tier, so recall read 1.0 regardless
        // of plan quality. Jittered copies keep the distribution while
        // making the 10x corpus genuinely 10x distinct vectors.
        else if (t == "embeddings" && i > 0)
          keyed.withColumn("embedding", expr(
            ("transform(embedding, (x, i) -> CAST(x + " +
              "(pmod(xxhash64(vec_id, i, COPY), 2001) - 1000) / 16000.0" +
              " AS FLOAT))").replace("COPY", i.toString)))
        else keyed
      }
      reps.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"SF1GEN $t x$copies written")
    }
    spark.stop()
  }
}
