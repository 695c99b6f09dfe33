package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.pipeline.HcpIntegration
import graft.sink.GraphSink
import graft.state.SnapshotStore
import graft.streaming.StreamingSync

/** Streaming variant: the same operators under foreachBatch (SURVEY §2.8),
  * driven synchronously by a file source + processAllAvailable. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("incremental sync over a document stream: create then delete") {
    val root = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    val store = new SnapshotStore(spark, s"$root/state")
    val sink = new GraphSink(spark, s"$root/graph")
    val sync = new StreamingSync(spark, store, sink)
    val spec = HcpIntegration.spec("hcp-stream", _ => null)

    val stream = spark.readStream.schema(Schemas.hcpDocument).json(inDir)
    val q = sync.start(spec, stream, s"$root/ckpt")
    try {
      // micro-batch 1: the golden document
      Files.writeString(java.nio.file.Paths.get(s"$inDir/doc1.json"),
        HcpFixture.json)
      q.processAllAvailable()
      assert(sink.readNodes("bucket").count() === 2)
      assert(sink.readEdges("creates__version__packer_build").count() === 3)

      // micro-batch 2: empty buckets → full delete flow
      Files.writeString(java.nio.file.Paths.get(s"$inDir/doc2.json"),
        HcpFixture.emptyJson)
      q.processAllAvailable()
      assert(sink.readNodes("bucket").count() === 0)
      assert(sink.readNodes("org").count() === 0)
    } finally q.stop()
  }

  test("windowed agg: streaming result equals batch result") {
    val root = Files.createTempDirectory("graft-wnd").toString
    val inDir = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    // small event file with ts as ISO strings → timestamp
    val rows = (0 until 100).map { i =>
      s"""{"ts": "2024-01-01T0${i % 10}:0${i % 6}:00Z", "event_type": "t${i % 3}", "value": ${i % 7}.5}"""
    }
    Files.writeString(java.nio.file.Paths.get(s"$inDir/ev.json"),
      rows.mkString("\n"))
    val schema = "ts TIMESTAMP, event_type STRING, value DOUBLE"
    val sync = new StreamingSync(spark, null, null)

    val batchDf = spark.read.schema(schema).json(inDir)
    val expect = sync.windowedAgg(batchDf, "ts", "event_type", "1 hour", "1 hour")
      .collect().map(_.toSeq).toSet

    val streamDf = spark.readStream.schema(schema).json(inDir)
    val agg = sync.windowedAgg(streamDf, "ts", "event_type", "1 hour", "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("wnd_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wnd_out").collect().map(_.toSeq).toSet
      assert(got === expect)
    } finally q.stop()
  }
}
