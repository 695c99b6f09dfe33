package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.GraphAlgos

/** Forward–backward SCC decomposition: known-graph answers, a brute-force
  * (Floyd–Warshall mutual-reachability) cross-check on a pseudo-random
  * directed graph, and the degenerate shapes (chain in id order — the
  * min-id-pivot worst case the hashed pivot exists for; empty graph;
  * self-loops). */
class SccSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def scc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphAlgos.stronglyConnectedComponents(
        edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two cycles bridged by a DAG edge") {
    val m = scc(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L,
      10L -> 11L, 11L -> 12L, 12L -> 10L, 3L -> 10L))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("figure-8: two cycles sharing a node are ONE component") {
    val m = scc(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L,
      3L -> 4L, 4L -> 5L, 5L -> 3L))
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("id-ordered chain: all singletons (hashed-pivot split path)") {
    val m = scc((0L until 40L).map(i => i -> (i + 1)))
    assert(m.size === 41 && m.forall { case (k, v) => k == v })
  }

  test("self-loops and an empty graph") {
    val m = scc(Seq(7L -> 7L, 7L -> 8L))
    // the self-loop edge is dropped; 7→8 nodes are singleton SCCs
    assert(m === Map(7L -> 7L, 8L -> 8L))
    // a node whose ONLY edge is a self-loop is still a singleton SCC
    val iso = scc(Seq(9L -> 9L, 1L -> 2L, 2L -> 1L))
    assert(iso === Map(9L -> 9L, 1L -> 1L, 2L -> 1L))
    assert(scc(Seq.empty[(Long, Long)]).isEmpty)
  }

  test("pseudo-random graph matches brute-force mutual reachability") {
    // deterministic 60-node graph, ~150 edges
    val n = 60
    val edges = (for {
      i <- 0 until n; j <- 0 until n
      if i != j && (i * 31 + j * 17) % 23 == 0
    } yield (i.toLong, j.toLong)).toSeq
    // Floyd–Warshall reachability on the driver — the O(n³) ground truth
    val reach = Array.fill(n, n)(false)
    edges.foreach { case (a, b) => reach(a.toInt)(b.toInt) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.map(_.toInt)
    val expected = nodes.map { v =>
      val mates = nodes.filter(u => u == v || (reach(v)(u) && reach(u)(v)))
      v.toLong -> mates.min.toLong
    }.toMap
    assert(scc(edges) === expected)
  }
}
