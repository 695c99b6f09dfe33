package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object PpLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def timed(l: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PPLAB $l%-18s rows=$n%9d sec=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val thr = 950L
    val words = org.apache.spark.sql.GraftSqlBridge.localCheckpointFreshStats(
      graft.operators.Transforms.keyedInputRebalance(
          df.select(col("doc_id").as("id"), col("text").as("__text")),
          col("id"))
        .select(col("id"), explode(split(lower(trim(col("__text"))), "\\s+")).as("w"))
        .dropDuplicates("id", "w"))
    timed("words")(words.count())
    val dfreq = words.groupBy("w").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("id").orderBy(col("df").asc, col("w").asc)
    val ranked = words.join(dfreq, "w")
      .select(col("id"), col("w"), row_number().over(byRarity).as("rnk"),
        count(lit(1)).over(Window.partitionBy("id")).as("n"))
    val prefix = ranked.filter(col("rnk") <=
        col("n") - expr(s"(n * ${2 * thr - 1} + 1999) DIV 2000") + lit(1))
      .select(col("id"), col("n"), col("w"))
    timed("prefix")(prefix.count())
    val C = 32
    val rankedW = org.apache.spark.sql.GraftSqlBridge.localCheckpointFreshStats(
      prefix.withColumn("r",
        row_number().over(Window.partitionBy("w").orderBy("id")))
      .withColumn("cx", expr(s"(r - 1) DIV $C")))
    val nch = rankedW.groupBy("w").agg(max(col("cx")).as("mc"))
    val yrep = rankedW.join(nch, "w")
      .withColumn("cy", explode(sequence(lit(0L), col("mc"))))
      .select(col("w"), col("cy").as("cx"), col("id"), col("n"), col("r"))
    // build side = rankedW, matching the PRODUCTION operator exactly
    // (an earlier lab draft hinted the replicated side and confounded
    // A/B comparisons against production-shaped variants)
    val cand = rankedW.as("x").hint("shuffle_hash")
      .join(yrep.as("y"),
        col("x.w") === col("y.w") && col("x.cx") === col("y.cx") &&
          col("x.r") < col("y.r") &&
          col("x.n") * 2000L >= col("y.n") * (2L * thr - 1) &&
          col("y.n") * 2000L >= col("x.n") * (2L * thr - 1))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(first(col("x.n")).as("na"), first(col("y.n")).as("nb"))
    timed("cand_nock")(cand.count())
    val arr = words.groupBy("id").agg(sort_array(collect_list(xxhash64(col("w")))).as("arr"))
    timed("arr")(arr.count())
    val out = cand
      .join(arr.select(col("id").as("a"), col("arr").as("aa")), "a")
      .join(arr.select(col("id").as("b"), col("arr").as("ab")), "b")
      .withColumn("common", size(array_intersect(col("aa"), col("ab"))).cast("long"))
      .withColumn("jacc_permille", round(col("common") * lit(1000.0) /
        (col("na") + col("nb") - col("common"))).cast("long"))
      .filter(col("jacc_permille") >= thr)
    timed("verify")(out.count())
    // option (b) receipt: the replication the chunk split costs — if this
    // is trivial next to the candidate volume, adaptive chunk sizing has
    // nothing to save
    timed("yrep_volume")(yrep.count())
    // option (a): threshold-bounded merge intersect replaces the per-row
    // hash-set array_intersect; abort bound minO−1 keeps it lossless with
    // the double-rounded jacc filter as the final arbiter
    val outB = cand
      .join(arr.select(col("id").as("a"), col("arr").as("aa")), "a")
      .join(arr.select(col("id").as("b"), col("arr").as("ab")), "b")
      .withColumn("common", graft.functions.BoundedIntersect(
        col("aa"), col("ab"),
        expr(graft.operators.Dedup.minOverlapMinus1Sql(thr))))
      .filter(col("common") >= 0L)
      .withColumn("jacc_permille", round(col("common") * lit(1000.0) /
        (col("na") + col("nb") - col("common"))).cast("long"))
      .filter(col("jacc_permille") >= thr)
    timed("verify_bounded")(outB.count())
    timed("verify_again")(out.count())
    timed("verify_bounded2")(outB.count())
    // option (b): adaptive chunk size — cap a token's chunk COUNT at 32
    // (local parallelism) by growing the chunk for mega-posting-lists:
    // csize = max(32, ceil(m/32)). Total pair volume is unchanged; only
    // the y-replication factor shrinks (846k -> ~?).
    val rankedA = org.apache.spark.sql.GraftSqlBridge.localCheckpointFreshStats(
      prefix
        .withColumn("m", count(lit(1)).over(Window.partitionBy("w")))
        .withColumn("cs", greatest(lit(32L), expr("(m + 31) DIV 32")))
        .withColumn("r",
          row_number().over(Window.partitionBy("w").orderBy("id")))
        .withColumn("cx", expr("(r - 1) DIV cs")))
    val nchA = rankedA.groupBy("w").agg(max(col("cx")).as("mc"))
    val yrepA = rankedA.join(nchA, "w")
      .withColumn("cy", explode(sequence(lit(0L), col("mc"))))
      .select(col("w"), col("cy").as("cx"), col("id"), col("n"), col("r"))
    timed("yrepA_volume")(yrepA.count())
    val candA = rankedA.as("x").hint("shuffle_hash")
      .join(yrepA.as("y"),
        col("x.w") === col("y.w") && col("x.cx") === col("y.cx") &&
          col("x.r") < col("y.r") &&
          col("x.n") * 2000L >= col("y.n") * (2L * thr - 1) &&
          col("y.n") * 2000L >= col("x.n") * (2L * thr - 1))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(first(col("x.n")).as("na"), first(col("y.n")).as("nb"))
    timed("cand_adaptive")(candA.count())
    timed("cand_again")(cand.count())
    timed("cand_adaptive2")(candA.count())
    // remaining lever: shrink the pair-dedup shuffle rows to bare
    // (a, b) — lengths re-fetched from a broadcast doc-length map after
    // dedup instead of riding every candidate row through the shuffle
    val lens = words.groupBy("id").agg(count(lit(1)).as("n"))
    val candSlim = rankedW.as("x").hint("shuffle_hash")
      .join(yrep.as("y"),
        col("x.w") === col("y.w") && col("x.cx") === col("y.cx") &&
          col("x.r") < col("y.r") &&
          col("x.n") * 2000L >= col("y.n") * (2L * thr - 1) &&
          col("y.n") * 2000L >= col("x.n") * (2L * thr - 1))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
      .join(broadcast(lens.select(col("id").as("a"), col("n").as("na"))), "a")
      .join(broadcast(lens.select(col("id").as("b"), col("n").as("nb"))), "b")
    timed("cand_slim")(candSlim.count())
    timed("cand_again2")(cand.count())
    timed("cand_slim2")(candSlim.count())
    spark.stop()
  }
}
