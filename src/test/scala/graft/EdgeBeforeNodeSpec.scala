package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._
import graft.sink.GraphSink
import graft.state.SnapshotStore

/** Multi-integration ordering hazards for reconciled edges (reconcile=true).
  *
  * The sink drops dangling pairs at MATCH time (GraphSink.resolveEndpoints,
  * reference `neo4j.go:90-91`), so edge state must only record pairs that
  * were actually applied. Two scenarios that break if state is committed
  * over the RAW batch instead of the resolved one:
  *
  *  1. Edge batch precedes its endpoint node (the endpoint is owned by a
  *     different integration that has not synced yet): the pair must retry
  *     on every sync and merge as soon as the node appears — not be stuck
  *     "unchanged" in state forever.
  *  2. A node delete detach-deletes the edge from the sink without touching
  *     the relation's state; when the node is re-created, the edge must
  *     reconverge.
  */
class EdgeBeforeNodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def doc(projects: Seq[String], buckets: Seq[String],
      edges: Seq[(String, String)])(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((projects, buckets, edges)).toDF("projects", "buckets", "edges")
  }

  private val projectNodes: DataFrame => DataFrame =
    _.select(explode(col("projects")).as("external_id"))
  private val bucketNodes: DataFrame => DataFrame =
    _.select(explode(col("buckets")).as("external_id"))
  private val edgeBatch: DataFrame => DataFrame =
    _.select(explode(col("edges")).as("e"))
      .select(col("e._1").as("a_id"), col("e._2").as("b_id"))
  private val noEdges: DataFrame => DataFrame =
    _.select(explode(col("edges")).as("e"))
      .select(col("e._1").as("a_id"), col("e._2").as("b_id"))
      .limit(0)

  /** Owns project nodes + the reconciled edge function. Never sees bucket
    * nodes — those belong to [[bucketInt]]. */
  private def edgeInt(pairs: Seq[(String, String)]): IntegrationSpec =
    IntegrationSpec("edge-int",
      doc(Seq("p1"), Nil, pairs),
      Seq(
        FunctionSpec("projects", CreateNode("project"), projectNodes),
        FunctionSpec("project_bucket",
          CreateRelation("has", "project", "bucket", reconcile = true),
          edgeBatch)))

  /** Owns bucket nodes. Declares the relation (with an empty batch) so its
    * node deletes DETACH-delete from the shared edge table, like the
    * reference's DETACH DELETE across the whole graph (`neo4j.go:117`). */
  private def bucketInt(buckets: Seq[String]): IntegrationSpec =
    IntegrationSpec("bucket-int",
      doc(Nil, buckets, Nil),
      Seq(
        FunctionSpec("buckets", CreateNode("bucket"), bucketNodes),
        FunctionSpec("project_bucket_detach",
          CreateRelation("has", "project", "bucket"), noEdges)))

  test("dangling pair retries until its endpoint node arrives; " +
    "detach-deleted edge reconverges when the node returns") {
    val root = Files.createTempDirectory("graft-edge-order").toString
    val driver = new SyncDriver(spark,
      new SnapshotStore(spark, s"$root/state"),
      new GraphSink(spark, s"$root/graph"))
    val sink = new GraphSink(spark, s"$root/graph")
    def edges(): Set[(String, String)] =
      sink.readEdges("has__project__bucket")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet

    val pairs = Seq("p1" -> "b1", "p1" -> "b2")

    // 1: edge integration syncs FIRST — no bucket nodes exist yet.
    driver.run(edgeInt(pairs))
    assert(edges() === Set.empty, "dangling pairs must be dropped, not merged")

    // 2: buckets arrive from the other integration.
    driver.run(bucketInt(Seq("b1", "b2")))
    // 3: same unchanged edge batch — the pairs must merge now. (State
    // committed over the raw batch would mark them 'unchanged' and skip.)
    driver.run(edgeInt(pairs))
    assert(edges() === Set("p1" -> "b1", "p1" -> "b2"))

    // 4: bucket b2 deleted upstream — detach removes the edge from the
    // sink, but the edge integration's state is not touched.
    driver.run(bucketInt(Seq("b1")))
    assert(edges() === Set("p1" -> "b1"))

    // 5: edge integration syncs while b2 is gone — the pair must leave
    // state (unresolvable), not linger as 'unchanged'.
    driver.run(edgeInt(pairs))
    assert(edges() === Set("p1" -> "b1"))

    // 6+7: b2 re-created; the unchanged edge batch must re-merge the edge.
    driver.run(bucketInt(Seq("b1", "b2")))
    driver.run(edgeInt(pairs))
    assert(edges() === Set("p1" -> "b1", "p1" -> "b2"),
      "edge must reconverge after its endpoint node returns")
  }
}
