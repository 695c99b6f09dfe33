package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HcpTransforms._

/** Golden expectations from FIXTURES.md §A over the nine reference
  * transforms. */
class HcpTransformsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private def doc = HcpFixture.doc(spark)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSet

  test("bucket nodes: T1 explode + T3 project/rename") {
    val got = rows(bucketNodes(doc))
    assert(got === Set(
      Seq("b1", "base-img", "2024-01-01T00:00:00Z", "2024-06-01T00:00:00Z", "packer/b1"),
      Seq("b2", "app-img", "2024-02-01T00:00:00Z", "2024-07-01T00:00:00Z", "packer/b2")))
  }

  test("org/project nodes: T4 nested field + T13 dedup") {
    assert(rows(orgNodes(doc)) === Set(Seq("org1")))
    assert(rows(projectNodes(doc)) === Set(Seq("proj1")))
  }

  test("version nodes: T5 constant column") {
    assert(rows(versionNodes(doc)) === Set(
      Seq("v1", "v1.0", "true"), Seq("v2", "v2.3", "true")))
  }

  test("build nodes: T2 two-level correlated flatten") {
    assert(rows(buildNodes(doc)).map(_.head) === Set("bl1", "bl2", "bl3"))
    assert(buildNodes(doc).count() === 3)
  }

  test("edge pairs: T6 incl. correlated version→build") {
    assert(rows(orgProjectEdges(doc)) === Set(Seq("org1", "proj1")))
    assert(rows(projectBucketEdges(doc)) ===
      Set(Seq("proj1", "b1"), Seq("proj1", "b2")))
    assert(rows(bucketVersionEdges(doc)) ===
      Set(Seq("b1", "v1"), Seq("b2", "v2")))
    assert(rows(versionBuildEdges(doc)) ===
      Set(Seq("v1", "bl1"), Seq("v2", "bl2"), Seq("v2", "bl3")))
  }

  test("empty document yields empty outputs everywhere") {
    val e = HcpFixture.doc(spark, HcpFixture.emptyJson)
    Seq(bucketNodes(e), orgNodes(e), buildNodes(e), versionBuildEdges(e))
      .foreach(df => assert(df.count() === 0))
  }
}
