package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.GraphSink
import graft.state.ManifestedTable

class ManifestedTableSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mt").toString

  /** Evaluate a key's bucket id through the engine itself. */
  private def bucketIdOf(t: ManifestedTable, v: Long): Int =
    Seq(v).toDF("k").select(t.bucketOf(col("k"))).head().getLong(0).toInt

  test("commit + read round-trip; missing table reads empty") {
    val t = new ManifestedTable(spark, tmp() + "/t", 8)
    val schema = Seq((1L, "a")).toDF("external_id", "v").schema
    assert(!t.exists)
    assert(t.read(schema).count() === 0)
    val rows = (1L to 100L).map(i => (i, s"v$i")).toDF("external_id", "v")
    t.commitAll(rows, "external_id")
    assert(t.exists)
    assert(t.read(schema).as[(Long, String)].collect().toSet ===
      (1L to 100L).map(i => (i, s"v$i")).toSet)
  }

  test("partial commit rewrites only touched buckets; others carried by reference") {
    val base = tmp() + "/t"
    val t = new ManifestedTable(spark, base, 8)
    val rows = (1L to 100L).map(i => (i, "v1")).toDF("external_id", "v")
    t.commitAll(rows, "external_id")

    // manifest v1: all buckets point at one commit uuid
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs = fs.listStatus(new org.apache.hadoop.fs.Path(base, "data"))
      .map(_.getPath.getName).toSet
    val firstCommit = dataDirs
    assert(firstCommit.size === 1)

    // delta touching only key 7's bucket
    val touched = Set(bucketIdOf(t, 7L))
    val existing = t.readBucketSubset(touched,
      rows.schema).filter(col("external_id") =!= 7L)
    t.commitBuckets(
      existing.unionByName(Seq((7L, "v2")).toDF("external_id", "v")),
      "external_id", touched)

    // old commit dir must STILL be referenced (untouched buckets)
    assert(dataDirs.size === 2)
    assert(dataDirs.intersect(firstCommit).nonEmpty,
      "untouched buckets were rewritten")
    val schema = rows.schema
    val now = t.read(schema).as[(Long, String)].collect().toMap
    assert(now(7L) === "v2")
    assert(now(8L) === "v1")
    assert(now.size === 100)
  }

  test("delete-only delta empties a bucket's keys") {
    val t = new ManifestedTable(spark, tmp() + "/t", 4)
    val rows = (1L to 20L).map(i => (i, "x")).toDF("external_id", "v")
    t.commitAll(rows, "external_id")
    // drop keys 1..20 routed to bucket of key 3, keep none of them
    val b3 = bucketIdOf(t, 3L)
    val keep = t.readBucketSubset(Set(b3), rows.schema)
      .filter(t.bucketOf(col("external_id")) =!= b3) // nothing survives
    t.commitBuckets(keep, "external_id", Set(b3))
    val out = t.read(rows.schema).as[(Long, String)].collect().map(_._1).toSet
    assert(!out.contains(3L))
    assert((1L to 20L).filter(i => bucketIdOf(t, i) != b3)
      .forall(i => out.contains(i)))
  }

  test("crash debris (orphan data dir, tmp manifest) is GC'd and never read") {
    val base = tmp() + "/t"
    val t = new ManifestedTable(spark, base, 4)
    val rows = (1L to 10L).map(i => (i, "v")).toDF("external_id", "v")
    t.commitAll(rows, "external_id")

    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crashed commit: data dir written, manifest never renamed
    val orphan = new org.apache.hadoop.fs.Path(base, "data/dead-commit-uuid")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "__gbucket=0"))
    val tmpManifest = new org.apache.hadoop.fs.Path(base, ".tmp-manifest-dead")
    fs.create(tmpManifest, true).close()

    // reads ignore debris; next commit sweeps it
    assert(t.read(rows.schema).count() === 10)
    val b = bucketIdOf(t, 1L)
    t.commitBuckets(t.readBucketSubset(Set(b), rows.schema),
      "external_id", Set(b))
    assert(!fs.exists(orphan), "orphan data dir survived GC")
    assert(!fs.exists(tmpManifest), "tmp manifest survived GC")
    assert(t.read(rows.schema).count() === 10)
  }

  test("optimistic commit: raced counter fails loudly; stale claim recovers after TTL") {
    val base = tmp() + "/t"
    val t = new ManifestedTable(spark, base, 4, claimTtlMillis = 60000)
    val rows = (1L to 10L).map(i => (i, "v")).toDF("external_id", "v")
    t.commitAll(rows, "external_id") // counter 1
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // another writer holds the claim for counter 2 → this commit must fail
    val claim = new org.apache.hadoop.fs.Path(base, ".claim-000000000002")
    fs.create(claim, false).close()
    val b = bucketIdOf(t, 1L)
    val ex = intercept[java.io.IOException] {
      t.commitBuckets(t.readBucketSubset(Set(b), rows.schema),
        "external_id", Set(b))
    }
    assert(ex.getMessage.contains("concurrent commit"))
    assert(t.read(rows.schema).count() === 10) // table unharmed

    // the claimant crashed: age the claim past the TTL (no manifest ever
    // published at counter 2) → next commit sweeps it and proceeds
    fs.setTimes(claim, System.currentTimeMillis() - 3600 * 1000L, -1)
    t.commitBuckets(t.readBucketSubset(Set(b), rows.schema),
      "external_id", Set(b))
    assert(t.read(rows.schema).count() === 10)
    // the claim at the CURRENT counter must persist (deleting it would
    // reopen the race for this version); it is GC'd once superseded
    assert(fs.exists(claim))
    t.commitBuckets(t.readBucketSubset(Set(b), rows.schema),
      "external_id", Set(b)) // counter 3
    assert(!fs.exists(claim))
  }

  test("commitBuckets fails loudly when rows route outside the touched set") {
    val t = new ManifestedTable(spark, tmp() + "/t", 4)
    val rows = (1L to 10L).map(i => (i, "v")).toDF("external_id", "v")
    val b1 = bucketIdOf(t, 1L)
    // declare only key 1's bucket but pass every row
    val ex = intercept[IllegalArgumentException] {
      t.commitBuckets(rows, "external_id", Set(b1))
    }
    assert(ex.getMessage.contains("untouched buckets"))
  }

  test("bucketed edge table: pair delta rewrites only touched buckets") {
    val root = tmp() + "/g"
    val sink = new GraphSink(spark, root, edgeBuckets = 8)
    val pairBucket: (String, String) => Int = (a, b) =>
      Seq((a, b)).toDF("a_id", "b_id")
        .select(new ManifestedTable(spark, root + "/edges/r", 8)
          .bucketOf(col("a_id"), col("b_id"))).head().getLong(0).toInt

    val edges1 = (1 to 100).map(i => (s"a$i", s"b$i")).toDF("a_id", "b_id")
    val nonePairs = edges1.filter(lit(false))
    sink.applyEdgeDelta("r", edges1, nonePairs, "A", "B",
      alreadyResolved = true)

    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "edges/r/data"))
      .map(_.getPath.getName).toSet
    val firstCommit = dataDirs
    assert(firstCommit.size === 1)

    // small delta: one create, one delete — only their buckets rewritten
    val create = Seq(("a7", "bNew")).toDF("a_id", "b_id")
    val del = Seq(("a9", "b9")).toDF("a_id", "b_id")
    sink.applyEdgeDelta("r", create, del, "A", "B", alreadyResolved = true)

    assert(dataDirs.size === 2, "delta did not produce a second commit dir")
    assert(dataDirs.intersect(firstCommit).nonEmpty,
      "untouched edge buckets were rewritten")
    val got = sink.readEdges("r").as[(String, String)].collect().toSet
    val want = (1 to 100).filter(_ != 9).map(i => (s"a$i", s"b$i")).toSet +
      (("a7", "bNew"))
    assert(got === want)

    // replay the same delta (crash-recovery path): idempotent
    sink.applyEdgeDelta("r", create, del, "A", "B", alreadyResolved = true)
    assert(sink.readEdges("r").as[(String, String)].collect().toSet === want)
  }

  test("bucketed edge sink: merge/delta/detach semantics identical to plain sink") {
    val plain = new GraphSink(spark, tmp() + "/g0")
    val bucketed = new GraphSink(spark, tmp() + "/g1", edgeBuckets = 4)
    val nodesA = Seq("a1", "a2", "a3").map((_, "p")).toDF("external_id", "prop")
    val nodesB = Seq("b1", "b2", "b3").map((_, "p")).toDF("external_id", "prop")
    val noneKeys = nodesA.filter(lit(false)).select("external_id")
    for (s <- Seq(plain, bucketed)) {
      s.applyNodeDelta("A", nodesA, noneKeys)
      s.applyNodeDelta("B", nodesB, noneKeys)
      // a3→bX dangles: MATCH must drop it in both sinks
      s.mergeEdges("r", Seq(("a1", "b1"), ("a2", "b2"), ("a3", "bX"))
        .toDF("a_id", "b_id"), "A", "B")
      s.applyEdgeDelta("r",
        Seq(("a1", "b3"), ("a2", "b3")).toDF("a_id", "b_id"),
        Seq(("a2", "b2")).toDF("a_id", "b_id"), "A", "B")
      s.detachEdges("r", Seq("a1").toDF("external_id"),
        noneKeys.toDF("external_id"))
    }
    // merge keeps (a1,b1),(a2,b2) [a3→bX dangles]; delta adds (a1,b3),
    // (a2,b3) and deletes (a2,b2); detach of node a1 drops its two edges.
    val want = plain.readEdges("r").as[(String, String)].collect().toSet
    val got = bucketed.readEdges("r").as[(String, String)].collect().toSet
    assert(got === want)
    assert(got === Set(("a2", "b3")))
  }

  test("bucketed GraphSink: upsert/delete semantics identical to plain sink") {
    val plain = new GraphSink(spark, tmp() + "/g0")
    val bucketed = new GraphSink(spark, tmp() + "/g1", nodeBuckets = 8)
    val create1 = Seq(("a", "p1"), ("b", "p1"), ("c", "p1"))
      .toDF("external_id", "prop")
    val none = create1.filter(lit(false)).select("external_id")
    for (s <- Seq(plain, bucketed)) s.applyNodeDelta("n", create1, none)

    // update b, delete c, add d
    val create2 = Seq(("b", "p2"), ("d", "p1")).toDF("external_id", "prop")
    val del2 = Seq("c").toDF("external_id")
    for (s <- Seq(plain, bucketed)) s.applyNodeDelta("n", create2, del2)

    val want = plain.readNodes("n", create1.schema)
      .as[(String, String)].collect().toSet
    val got = bucketed.readNodes("n", create1.schema)
      .as[(String, String)].collect().toSet
    assert(got === want)
    assert(got === Set(("a", "p1"), ("b", "p2"), ("d", "p1")))

    // replay the same delta (crash-recovery path): idempotent
    bucketed.applyNodeDelta("n", create2, del2)
    assert(bucketed.readNodes("n", create1.schema)
      .as[(String, String)].collect().toSet === want)
  }
}
