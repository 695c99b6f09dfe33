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
}
