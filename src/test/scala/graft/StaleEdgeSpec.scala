package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.pipeline._
import graft.sink.GraphSink
import graft.state.SnapshotStore

/** The reference's stale-edge leak (SURVEY R4 fine print) and the engine's
  * opt-in fix: bucket b2 moves from proj1 to proj2 — both proj1 (still
  * used by b1) and b2 survive, so DETACH never fires and the default mode
  * keeps the stale proj1→b2 edge; reconcile mode deletes it. */
class StaleEdgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val movedJson = HcpFixture.json
    .replace(
      """"id": "b2", "name": "app-img", "created-at": "2024-02-01T00:00:00Z",
        |   "updated-at": "2024-07-01T00:00:00Z", "resource_name": "packer/b2",
        |   "location": {"organization_id": "org1", "project_id": "proj1"}"""
        .stripMargin.replaceAll("\n", " "),
      """"id": "b2", "name": "app-img", "created-at": "2024-02-01T00:00:00Z",
        |   "updated-at": "2024-07-02T00:00:00Z", "resource_name": "packer/b2",
        |   "location": {"organization_id": "org1", "project_id": "proj2"}"""
        .stripMargin.replaceAll("\n", " "))

  private def specWith(reconcileEdges: Boolean, name: String,
      body: String): IntegrationSpec = {
    import graft.operators.HcpTransforms._
    IntegrationSpec(name, s => HcpFixture.doc(s, body), Seq(
      FunctionSpec("buckets", CreateNode("bucket"), bucketNodes),
      FunctionSpec("projects", CreateNode("project"), projectNodes),
      FunctionSpec("project_bucket",
        CreateRelation("has", "project", "bucket", reconcile = reconcileEdges),
        projectBucketEdges)))
  }

  test("fixture sanity: the move keeps both endpoints alive") {
    assert(movedJson != HcpFixture.json)
  }

  for (mode <- Seq(false, true)) {
    test(s"reconcile=$mode: stale proj1→b2 edge ${if (mode) "deleted" else "leaks (faithful)"}") {
      val root = Files.createTempDirectory(s"graft-stale-$mode").toString
      val driver = new SyncDriver(spark,
        new SnapshotStore(spark, s"$root/state"),
        new GraphSink(spark, s"$root/graph"))
      val sink = new GraphSink(spark, s"$root/graph")

      driver.run(specWith(mode, s"stale-$mode", HcpFixture.json))
      assert(sink.readEdges("has__project__bucket").count() === 2)

      driver.run(specWith(mode, s"stale-$mode", movedJson))
      val edges = sink.readEdges("has__project__bucket")
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // proj2 node exists now, so proj2→b2 resolves in both modes
      assert(edges.contains(("proj2", "b2")))
      assert(edges.contains(("proj1", "b1")))
      if (mode) assert(!edges.contains(("proj1", "b2")), "stale edge not deleted")
      else assert(edges.contains(("proj1", "b2")), "reference leak semantics")
    }
  }
}
