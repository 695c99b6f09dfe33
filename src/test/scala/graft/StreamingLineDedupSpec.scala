package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.{LineOcc, LineVerdict, StatefulLineDedup}

/** Streaming CCNet line dedup must equal the batch tier over everything
  * seen through the end of each arrival's micro-batch: per-line
  * doc-frequency state carried by `transformWithState` replaces the
  * batch-global countDistinct, and a batch's verdicts use the post-batch
  * frequency exactly as the batch operator counts the arriving docs. */
class StreamingLineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Feed `slices` of (id, text) docs one micro-batch each; return every
    * verdict keyed by (id, pos). */
  private def runStream(name: String,
      slices: Seq[org.apache.spark.sql.DataFrame], width: Int,
      maxDocFreq: Int): Map[(Long, Long), (String, Long)] = {
    val root = Files.createTempDirectory(s"graft-$name").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("line STRING, id LONG, pos LONG").json(inDir)
      .as[LineOcc]
    val verdicts = StatefulLineDedup.verdicts(stream, maxDocFreq)
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = verdicts.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName(name).start()
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        val occ = TextAnalysis
          .fixedWidthLines(slice, "text", "doc_id", width)
          .select(col("line"), col("id"), col("pos"))
        val json = occ.toJSON.collect().mkString("\n")
        Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
        q.processAllAvailable()
      }
      spark.table(name).as[LineVerdict].collect()
        .map(v => (v.id, v.pos) -> ((v.line, v.kept))).toMap
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Rebuild lineDedup's (n_lines, n_kept, kept_text) rows from the
    * verdict stream for the given doc ids. */
  private def rebuild(verdicts: Map[(Long, Long), (String, Long)],
      ids: Set[Long]): Map[Long, (Long, Long, String)] =
    verdicts.toSeq.collect {
      case ((id, pos), (line, kept)) if ids(id) => (id, pos, line, kept)
    }.groupBy(_._1).map { case (id, rows) =>
      val ordered = rows.sortBy(_._2)
      id -> ((rows.size.toLong, rows.count(_._4 == 1L).toLong,
        ordered.filter(_._4 == 1L).map(_._3).mkString(" ")))
    }

  private def batchMap(docs: org.apache.spark.sql.DataFrame, width: Int,
      maxDocFreq: Int): Map[Long, (Long, Long, String)] =
    TextAnalysis.lineDedup(docs, "text", "doc_id", width, maxDocFreq)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("per-slice prefix parity with the batch operator on the fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
    val slices = Seq(
      docs.filter(col("doc_id") <= cut1),
      docs.filter(col("doc_id") > cut1 && col("doc_id") <= cut2),
      docs.filter(col("doc_id") > cut2))
    val got = runStream("linededup_prefix", slices, width = 8,
      maxDocFreq = 1)
    val prefixes = Seq(
      docs.filter(col("doc_id") <= cut1),
      docs.filter(col("doc_id") <= cut2),
      docs)
    val sliceIds = Seq(
      ids.filter(_ <= cut1).toSet,
      ids.filter(i => i > cut1 && i <= cut2).toSet,
      ids.filter(_ > cut2).toSet)
    prefixes.zip(sliceIds).foreach { case (prefix, inSlice) =>
      val want = batchMap(prefix, 8, 1).filter(kv => inSlice(kv._1))
      val have = rebuild(got, inSlice)
      assert(have === want)
    }
    // the cap does real work on the fixture: some line somewhere dropped
    assert(got.values.exists(_._2 == 0L), "no boilerplate line dropped")
  }

  test("cross-batch frequency carry: a repeated line flips to dropped") {
    val a = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val b = Seq((2L, "alpha beta gamma delta"),
      (3L, "unique line here now")).toDF("doc_id", "text")
    val got = runStream("linededup_carry", Seq(a, b), width = 4,
      maxDocFreq = 1)
    assert(got((1L, 0L))._2 == 1L) // first sighting: df=1, kept
    assert(got((2L, 0L))._2 == 0L) // second doc, later batch: df=2, dropped
    assert(got((3L, 0L))._2 == 1L)
    // same two docs in ONE batch: batch semantics drop BOTH (df=2)
    val both = runStream("linededup_onebatch",
      Seq(a.unionByName(b.filter(col("doc_id") === 2L))), width = 4,
      maxDocFreq = 1)
    assert(both((1L, 0L))._2 == 0L && both((2L, 0L))._2 == 0L)
  }
}
