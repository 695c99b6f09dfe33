package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Reconcile, Similarity}
import graft.sink.GraphSink

class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("mergeEdges drops dangling edges like Cypher MATCH (neo4j.go:90-91)") {
    val root = Files.createTempDirectory("graft-edge").toString
    val sink = new GraphSink(spark, root)
    sink.applyNodeDelta("a",
      Seq(("a1", "x")).toDF("external_id", "p"),
      spark.emptyDataFrame.select(lit("").as("external_id")).limit(0))
    sink.applyNodeDelta("b",
      Seq(("b1", "y")).toDF("external_id", "p"),
      spark.emptyDataFrame.select(lit("").as("external_id")).limit(0))
    val edges = Seq(("a1", "b1"), ("a1", "bMISSING"), ("aMISSING", "b1"))
      .toDF("a_id", "b_id")
    sink.mergeEdges("r__a__b", edges, "a", "b")
    val got = sink.readEdges("r__a__b").as[(String, String)].collect().toSet
    assert(got === Set(("a1", "b1")))
    // idempotent re-merge (MERGE semantics)
    sink.mergeEdges("r__a__b", edges, "a", "b")
    assert(sink.readEdges("r__a__b").count() === 1)
  }

  test("duplicate keys in a batch: both diffs emitted, sink keeps one row") {
    val state = Reconcile.postState(
      Seq(("k", "t0")).toDF("external_id", "updated_at"))
    val dup = Seq(("k", "t1"), ("k", "t2"), ("new", "t1"))
      .toDF("external_id", "updated_at")
    val d = Reconcile.diff(dup, state)
    assert(d.toCreate.count() === 3) // both changed dups + the new key
    val root = Files.createTempDirectory("graft-dup").toString
    val sink = new GraphSink(spark, root)
    sink.applyNodeDelta("n", d.toCreate, d.toDelete)
    // one row per key despite duplicate creates (MERGE invariant)
    assert(sink.readNodes("n").count() === 2)
  }

  test("localCheckpointFreshStatsCounted: count == rows, content and" +
      " stats-freshness match the uncounted form") {
    import org.apache.spark.sql.GraftSqlBridge
    import spark.implicits._
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") % 7)
      .filter(col("v") =!= 3)
    val (ck, n) = GraftSqlBridge.localCheckpointFreshStatsCounted(df)
    assert(n === df.count())
    assert(ck.count() === n)
    assert(ck.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      df.orderBy("id").collect().map(_.getLong(0)).toSeq)
    // fresh stats: the checkpointed plan's estimate must not carry the
    // origin plan's (the compounding-self-join trap the uncounted form
    // exists to break) — both forms must report the same default
    val statsCounted = ck.queryExecution.optimizedPlan.stats.sizeInBytes
    val statsPlain = GraftSqlBridge.localCheckpointFreshStats(df)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(statsCounted === statsPlain)
    // empty frame: counted zero, still a usable frame
    val (eck, en) = GraftSqlBridge
      .localCheckpointFreshStatsCounted(df.filter(lit(false)))
    assert(en === 0L && eck.count() === 0L)
    assert(eck.schema === df.schema)
  }

  test("stub multimodal features flow into ANN search end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assets = Multimodal.toAssets(docs, "doc_id", "text", "source", "image")
    val feats = Multimodal.extractFeatures(assets, dim = 8)
      .select(col("asset_id").as("id"),
        col("vec").cast("array<float>").as("vec"))
    val out = Similarity.bruteForceTopK(
      feats.filter(col("id") < 3), feats.filter(col("id") >= 3), 4)
    val rows = out.collect()
    assert(rows.length === 12) // 3 queries × top-4
    assert(rows.forall(_.getAs[Long]("cos_permille") <= 1000))
  }

  test("semDedup: corpus smaller than nCells — singleton cells, all kept") {
    val vecs = Seq((3L, Seq(1f, 0f)), (9L, Seq(0f, 1f))).toDF("id", "vec")
    val got = Similarity.semDedup(vecs, nCells = 16,
        thresholdPermille = 900)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // every vector is its own nearest centroid (cos 1000 with itself);
    // orthogonal cells never meet, nothing is pruned
    assert(got === Map(3L -> ((3L, 0L)), 9L -> ((9L, 0L))))
  }

  test("lineDedup: short docs, width-1 lines, all-dropped rebuild is ''") {
    import graft.operators.TextAnalysis
    // width > token count → one short line per doc; exact-dup docs drop
    val short = Seq((1L, "x y"), (2L, "x y"), (3L, "z")).toDF("doc_id", "t")
    val g1 = TextAnalysis.lineDedup(short, "t", "doc_id",
        width = 8, maxDocFreq = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(g1(1L) === ((1L, 0L, "")) && g1(2L) === ((1L, 0L, "")))
    assert(g1(3L) === ((1L, 1L, "z")))
    // width=1: per-word dedup degenerates gracefully (shared word drops)
    val g2 = TextAnalysis.lineDedup(
        Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "t"), "t", "doc_id",
        width = 1, maxDocFreq = 1)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(g2(1L) === ((2L, 1L, "a")) && g2(2L) === ((2L, 1L, "c")))
  }

  test("modularityStats: empty edge set yields an empty report, no crash") {
    import graft.operators.GraphAlgos
    val e = Seq.empty[(Long, Long)].toDF("s", "d")
    val lab = Seq((1L, 1L)).toDF("id", "lab")
    assert(GraphAlgos.modularityStats(e, "s", "d", lab).count() === 0L)
  }

  test("SCD2 as-of lookup equals the validity-BETWEEN join, including " +
      "same-day empty intervals and before-first-version facts") {
    import graft.operators.{AsofJoin, Transforms}
    // cust 1: three versions, two opened the SAME day (the first leaves
    // an empty [d2, d2) interval the BETWEEN form can never match);
    // cust 2: one version; facts probe before/at/after each boundary
    val src = Seq(
      (1L, 101L, "2024-01-10", 100L),
      (1L, 102L, "2024-01-20", 200L), // empty interval: next is same day
      (1L, 103L, "2024-01-20", 300L),
      (2L, 201L, "2024-03-01", 400L)
    ).toDF("k", "ok", "od", "pc")
    val dim = Transforms.scdType2(src, Seq(col("k")),
        Seq(col("od"), col("ok")), col("od"))
      .select(col("k"), col("eff_from"),
        coalesce(col("eff_to"), lit("9999-12-31")).as("eff_to"),
        col("is_current"))
    val facts = Seq(
      (1L, "2024-01-05"), // before any version -> -1
      (1L, "2024-01-10"), // at v1 open
      (1L, "2024-01-19"), // inside v1
      (1L, "2024-01-20"), // same-day double update -> v3, never v2
      (1L, "2024-06-01"), // current
      (2L, "2024-02-01"), // before cust 2's only version -> -1
      (2L, "2024-03-01")
    ).toDF("k", "ship")
    val between = facts.join(dim,
        facts("k") === dim("k") && col("ship") >= col("eff_from") &&
          col("ship") < col("eff_to"), "left")
      .select(facts("k"), col("ship"),
        coalesce(col("is_current"), lit(-1L)).as("vs"))
      .orderBy("k", "ship").as[(Long, String, Long)].collect().toSeq
    val asof = AsofJoin.asof(
        facts.withColumnRenamed("ship", "ship_od"),
        dim.withColumnRenamed("eff_from", "ship_od"), "k", "ship_od",
        payloadCols = Seq("is_current"), rightTieBreak = Seq("eff_to"))
      .select(col("k"), col("ship_od").as("ship"),
        coalesce(col("asof_is_current"), lit(-1L)).as("vs"))
      .orderBy("k", "ship").as[(Long, String, Long)].collect().toSeq
    assert(between.count(_._3 === -1L) === 2) // the two early facts
    assert(asof === between)
  }

  test("property: SCD2 as-of lookup equals the validity-BETWEEN join " +
      "on random version chains (duplicate days, deep chains, sparse " +
      "facts)") {
    import graft.operators.{AsofJoin, Transforms}
    val rnd = new scala.util.Random(77L)
    for (round <- 1 to 3) {
      // up to 8 customers, chains up to 12 versions with REPEATED days
      val src = (0 until 40).map { i =>
        val k = 1L + rnd.nextInt(8)
        val day = f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
        (k, 1000L + i, day, rnd.nextInt(1000).toLong)
      }.toDF("k", "ok", "od", "pc")
      val dim = Transforms.scdType2(src, Seq(col("k")),
          Seq(col("od"), col("ok")), col("od"))
        .select(col("k"), col("eff_from"),
          coalesce(col("eff_to"), lit("9999-12-31")).as("eff_to"),
          col("is_current"))
      val facts = (0 until 60).map { i =>
        val k = 1L + rnd.nextInt(10) // some customers have no versions
        val day = f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d"
        (i.toLong, k, day)
      }.toDF("fid", "k", "ship")
      val between = facts.join(dim,
          facts("k") === dim("k") && col("ship") >= col("eff_from") &&
            col("ship") < col("eff_to"), "left")
        .select(col("fid"), coalesce(col("is_current"), lit(-1L)).as("vs"))
        .orderBy("fid").as[(Long, Long)].collect().toSeq
      val asof = AsofJoin.asof(
          facts.withColumnRenamed("ship", "ship_od"),
          dim.withColumnRenamed("eff_from", "ship_od"), "k", "ship_od",
          payloadCols = Seq("is_current"),
          rightTieBreak = Seq("eff_to"))
        .select(col("fid"),
          coalesce(col("asof_is_current"), lit(-1L)).as("vs"))
        .orderBy("fid").as[(Long, Long)].collect().toSeq
      assert(between.size === 60, s"BETWEEN must match at most one " +
        s"version per fact (round $round)") // contiguity sanity
      assert(asof === between, s"divergence on random round $round")
    }
  }
}
