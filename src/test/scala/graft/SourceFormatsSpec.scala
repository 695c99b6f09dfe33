package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The engine inherits every Spark source; prove the ones the reference
  * family would use — JSON (the reference's native shape), CSV, ORC —
  * round-trip losslessly against the parquet fixtures. */
class SourceFormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("documents survive parquet → json/csv/orc → read round-trips") {
    val root = Files.createTempDirectory("graft-fmt").toString
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val expect = docs.collect().map(_.toSeq).toSet

    docs.write.json(s"$root/j")
    assert(spark.read.schema(docs.schema).json(s"$root/j")
      .collect().map(_.toSeq).toSet === expect)

    docs.write.option("header", "true").csv(s"$root/c")
    assert(spark.read.schema(docs.schema)
      .option("header", "true").csv(s"$root/c")
      .collect().map(_.toSeq).toSet === expect)

    docs.write.orc(s"$root/o")
    assert(spark.read.orc(s"$root/o")
      .collect().map(_.toSeq).toSet === expect)
  }

  test("HCP document pipeline runs identically from a JSON file source") {
    val root = Files.createTempDirectory("graft-jsonsrc").toString
    Files.writeString(java.nio.file.Paths.get(s"$root/doc.json"),
      HcpFixture.json)
    val doc = spark.read.schema(graft.model.Schemas.hcpDocument)
      .json(s"$root/doc.json")
    assert(graft.operators.HcpTransforms.bucketNodes(doc).count() === 2)
    assert(graft.operators.HcpTransforms.versionBuildEdges(doc).count() === 3)
  }
}
