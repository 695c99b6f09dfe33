package graft.tools

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: repeated runs of one query inside a warm session, with
  * GC + JIT time deltas per iteration, to separate plan cost from JVM
  * pathology (GC thrash / codegen compilation storms). */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = if (args.nonEmpty) args(0) else "dedup_simhash"
    val iters = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def gcMillis: Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def jitMillis: Long = ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime

    // experiment variants: <name>_par repartitions the scanned table before
    // the per-row work, testing the input-split-rebalance hypothesis.
    val experiments: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "simhash_par" -> ((s, dir) =>
        graft.operators.Dedup.simhash(
          s.read.parquet(s"$dir/documents.parquet").repartition(32),
          "text", "doc_id")),
      "q1_agg_par" -> ((s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet").repartition(32)
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_cents"),
            count(lit(1)).as("n"))
      }),
      // curate_docs stage isolation: scorer filter alone vs dedup alone
      "curate_filter" -> ((s, dir) => {
        val d = s.read.parquet(s"$dir/documents.parquet")
          .repartition(col("doc_id"))
        d.filter(
          graft.operators.TextAnalysis.tokenCount(col("text")) >= 20 &&
          graft.operators.TextAnalysis.qualityScore(col("text")) >= 400 &&
          graft.operators.TextAnalysis.langId(col("text")) === "en")
      }),
      "curate_dedup_only" -> ((s, dir) =>
        graft.operators.Dedup.exactSurvivors(
          s.read.parquet(s"$dir/documents.parquet").repartition(col("doc_id")),
          "text", "doc_id")),
      "filter_token" -> ((s, dir) =>
        s.read.parquet(s"$dir/documents.parquet").repartition(col("doc_id"))
          .filter(graft.operators.TextAnalysis.tokenCount(col("text")) >= 20)),
      "filter_quality" -> ((s, dir) =>
        s.read.parquet(s"$dir/documents.parquet").repartition(col("doc_id"))
          .filter(graft.operators.TextAnalysis.qualityScore(col("text")) >= 400)),
      "filter_lang" -> ((s, dir) =>
        s.read.parquet(s"$dir/documents.parquet").repartition(col("doc_id"))
          .filter(graft.operators.TextAnalysis.langId(col("text")) === "en")),
      // decontaminate shape A/B/C: pre-filtered two-stream form (the
      // general benchmarkContamination) vs checkpoint-shared gram stream;
      // variant B (carried-tag + repartition(s)) is the live query.
      "decont_two" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val split = graft.operators.TextAnalysis.hashSplit(col("text"))
        graft.operators.Dedup.benchmarkContamination(
          docs.filter(split === "train"), docs.filter(split === "test"),
          "text", "doc_id", n = 8)
      }),
      // scd2_lookup stage isolation + asof-rewrite A/B: dim build alone,
      // facts build alone, and the full query with the BETWEEN-residual
      // hash join replaced by the AsofJoin union-window pass (versions
      // tile contiguously, so asof-backward on eff_from with a last-wins
      // eff_to tie-break is the same match).
      "scd2_dim" -> ((s, dir) =>
        graft.operators.Transforms.scdType2(
          s.read.parquet(s"$dir/orders.parquet")
            .select(col("o_custkey"), col("o_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
              (col("o_totalprice") * 100).cast("long").as("price_cents")),
          Seq(col("o_custkey")), Seq(col("od"), col("o_orderkey")),
          col("od"))),
      "scd2_facts" -> ((s, dir) =>
        s.read.parquet(s"$dir/lineitem.parquet")
          .join(s.read.parquet(s"$dir/orders.parquet")
              .select(col("o_orderkey").as("fk_ok"),
                col("o_custkey").as("fk_ck")),
            col("l_orderkey") === col("fk_ok"))
          .select(col("fk_ck"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_od"),
            (col("l_extendedprice") * 100).cast("long").as("ext_cents"))),
      "scd2_asof" -> ((s, dir) => {
        val dim = graft.operators.Transforms.scdType2(
          s.read.parquet(s"$dir/orders.parquet")
            .select(col("o_custkey"), col("o_orderkey"),
              date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
              (col("o_totalprice") * 100).cast("long").as("price_cents")),
          Seq(col("o_custkey")), Seq(col("od"), col("o_orderkey")),
          col("od"))
          .select(col("o_custkey").as("fk_ck"),
            col("eff_from").as("ship_od"),
            coalesce(col("eff_to"), lit("9999-12-31")).as("eff_to"),
            col("is_current"))
        val facts = s.read.parquet(s"$dir/lineitem.parquet")
          .join(s.read.parquet(s"$dir/orders.parquet")
              .select(col("o_orderkey").as("fk_ok"),
                col("o_custkey").as("fk_ck")),
            col("l_orderkey") === col("fk_ok"))
          .select(col("fk_ck"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_od"),
            (col("l_extendedprice") * 100).cast("long").as("ext_cents"))
        graft.operators.AsofJoin.asof(facts, dim, "fk_ck", "ship_od",
            payloadCols = Seq("is_current"),
            rightTieBreak = Seq("eff_to"))
          .groupBy(coalesce(col("asof_is_current"), lit(-1L))
            .as("version_state"))
          .agg(count(lit(1)).as("n_facts"),
            sum(col("ext_cents")).as("ext_cents_sum"))
      }),
      // temporal_reach closing-aggregate A/B: the two countDistincts over
      // the raw path stream ride an Expand (3x the rows into the
      // shuffle); pre-aggregating to the (a, w) grid first map-side
      // combines to a node-pair-bounded table and the distincts become
      // exact aggregates OF that grid.
      "temporal_pre" -> ((s, dir) => {
        val raw = s.read.parquet(s"$dir/lineitem.parquet")
          .join(s.read.parquet(s"$dir/orders.parquet"),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") % 150).as("x"),
            (col("l_suppkey") % 150).as("y"),
            expr("datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01')")
              .cast("long").as("d"))
        val e = raw.union(raw.select(col("y").as("x"), col("x").as("y"),
            col("d")))
          .filter(col("x") =!= col("y")).distinct()
        val intervals = e.select(col("x").as("a"), col("y").as("m"),
          (col("d") + 1).as("lo"), (col("d") + 7).as("hi"))
        val points = e.select(col("x").as("m"), col("y").as("w"),
          col("d").as("d2"))
        val grid = graft.operators.RangeJoin.pointInInterval(points,
            intervals, "d2", "lo", "hi", binWidth = 7L, keys = Seq("m"))
          .filter(col("w") =!= col("a"))
          .groupBy(col("a"), col("w")).agg(count(lit(1)).as("c"))
        grid.agg(sum(col("c")).as("n_paths"),
          count(lit(1)).as("n_pairs"),
          countDistinct(col("a")).as("n_sources"))
      }),
      // nbc_refresh stage isolation
      "nbc_state" -> ((s, dir) =>
        graft.operators.NaiveBayes.trainGramCounts(
          s.read.parquet(s"$dir/documents.parquet")
            .filter(col("doc_id") % 3 < 2), "text", "lang")),
      "nbc_maint" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val base = docs.filter(col("doc_id") % 3 < 2)
        val delta = docs.filter(col("doc_id") % 3 === 2)
          .withColumn("__op", lit(1))
          .unionByName(base.filter(col("doc_id") % 5 === 0)
            .withColumn("__op", lit(-1)))
        graft.operators.NaiveBayes.maintainGramCounts(
          graft.operators.NaiveBayes.trainGramCounts(base, "text",
            "lang"),
          delta, "text", "lang", "__op")
      }),
      "nbc_classify_only" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        graft.operators.NaiveBayes.nbcScore(
          docs.filter(col("doc_id") % 3 === 2), "text", "doc_id", "lang",
          graft.operators.NaiveBayes.nbcTrain(
            docs.filter(col("doc_id") % 3 < 2), "text", "lang"))
      }),
      "decont_ckpt" -> ((s, dir) => {
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val split = graft.operators.TextAnalysis.hashSplit(col("text"))
        val tagged = docs.withColumn("__split", split)
          .filter(col("__split").isin("train", "test"))
        val grams = graft.operators.Dedup.shingleStream(
            tagged, "text", "doc_id", 8, carry = Seq("__split"))
          .dropDuplicates("id", "s").localCheckpoint()
        val tg = grams.filter(col("__split") === "train").select(col("id"), col("s"))
        val bg = grams.filter(col("__split") === "test")
          .select(col("id").as("bench_id"), col("s"))
        tg.join(broadcast(bg), "s").groupBy(col("id"))
          .agg(countDistinct(col("s")).as("n_grams"),
            countDistinct(col("bench_id")).as("n_bench_docs"))
      })
    )
    sys.env.get("SPARK_GRAFT_CONF").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"PERFCONF $k=$v")
    }
    val fn = experiments.getOrElse(qname, graft.SparkEntry.queries(qname))
    for (i <- 1 to iters) {
      val g0 = gcMillis; val j0 = jitMillis; val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PERF $qname iter=$i rows=$n sec=$sec%.2f gc_ms=${gcMillis - g0} jit_ms=${jitMillis - j0}")
    }
    spark.stop()
  }
}
