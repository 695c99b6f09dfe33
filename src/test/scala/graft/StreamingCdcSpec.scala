package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.streaming.{ByteRow, ChunkOut, StatefulCdcChunker}

/** Streaming content-defined chunking must equal the batch operator on
  * any in-order micro-batch slicing: the O(window) gear carry replaces
  * the batch lag columns, chunks close the moment their boundary byte
  * arrives, and the end-marker row flushes the open trailing chunk. */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def byteAt(id: Long, k: Long): Long =
    (((id * 31L + k + 7L) * 0x9E3779B97F4A7C15L) >>> 33) % 256L

  /** Feed byte-row `slices` one micro-batch each; return emitted chunks. */
  private def runStream(name: String,
      slices: Seq[Seq[ByteRow]]): Set[(Long, Long, Long, Long)] = {
    val root = Files.createTempDirectory(s"graft-$name").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("id LONG, k LONG, b LONG").json(inDir).as[ByteRow]
    val chunks = StatefulCdcChunker.chunks(stream)
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = chunks.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName(name).start()
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        val json = slice.toDF().toJSON.collect().mkString("\n")
        Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
        q.processAllAvailable()
      }
      spark.table(name).as[ChunkOut].collect()
        .map(c => (c.id, c.off, c.len, c.chunkSig)).toSet
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("any slicing + end marker equals the batch operator exactly") {
    val n = 2048L
    val assets = Seq(1L, 2L)
    val allRows = assets.flatMap(id =>
      (0L until n).map(k => ByteRow(id, k, byteAt(id, k))))
    // batch truth on the same rows
    val want = Multimodal.cdcChunkRows(
        allRows.toDF("id", "k", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(want.size >= 8, s"degenerate fixture: ${want.size} chunks")
    // three uneven in-order slices, then the end marker per asset
    val cuts = Seq(0L -> 700L, 700L -> 701L, 701L -> n)
    val slices = cuts.map { case (a, b) =>
      allRows.filter(r => r.k >= a && r.k < b)
    } :+ assets.map(id => ByteRow(id, n, -1L))
    val got = runStream("cdc_parity", slices)
    assert(got === want)
  }

  test("mid-batch marker + resume bytes segment as if the resume came " +
      "in a later batch (positional markers)") {
    val cut = 700L; val n = 1024L
    val head = (0L until cut).map(k => ByteRow(9L, k, byteAt(9L, k)))
    val tail = (cut until n).map(k => ByteRow(9L, k, byteAt(9L, k)))
    val marker = ByteRow(9L, cut, -1L)
    val fin = ByteRow(9L, n, -1L)
    // the already-correct path: marker ends batch 1, resume is batch 2
    val want = runStream("cdc_resume_two",
      Seq(head :+ marker, tail :+ fin))
    // the ADVICE scenario: marker and post-marker bytes in ONE batch —
    // the marker's k orders it between head and tail, so segmentation
    // must be identical instead of folding the tail into the old chunk
    val got = runStream("cdc_resume_one", Seq((head :+ marker) ++ tail :+ fin))
    assert(got === want)
    assert(want.exists(c => c._2 == cut),
      "a chunk must restart exactly at the forced cut")
  }

  test("chunks close as their boundary arrives; only the tail waits") {
    val n = 1024L
    val rows = (0L until n).map(k => ByteRow(7L, k, byteAt(7L, k)))
    val want = Multimodal.cdcChunkRows(rows.toDF("id", "k", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // NO end marker: everything except the per-asset trailing chunk is
    // already out (closed chunks are emitted eagerly, not on flush)
    val got = runStream("cdc_eager", Seq(rows))
    assert(got.size === want.size - 1)
    assert(got.subsetOf(want))
    val tail = (want -- got).head
    assert(tail._2 + tail._3 === n, "the missing chunk must be the tail")
  }
}
