package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.{GramOcc, GramVerdict, StatefulSubstringDedup}

/** Streaming exact-substring dedup must equal the batch tier over
  * everything seen through the end of each arrival's micro-batch:
  * per-gram occurrence state carried by `transformWithState` replaces
  * the batch-global `count >= 2`, and the spans rebuilt
  * (gaps-and-islands) from a slice's verdicts equal `dupSpans` over
  * that prefix restricted to the slice's documents. */
class StreamingSubstringSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Feed `slices` of (doc_id, text) docs one micro-batch each; return
    * every verdict keyed by (id, p). */
  private def runStream(name: String,
      slices: Seq[org.apache.spark.sql.DataFrame],
      k: Int): Map[(Long, Long), Long] = {
    val root = Files.createTempDirectory(s"graft-$name").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("gram STRING, id LONG, p LONG").json(inDir)
      .as[GramOcc]
    val verdicts = StatefulSubstringDedup.verdicts(stream)
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = verdicts.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName(name).start()
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        val occ = TextAnalysis.windowGrams(slice, "text", "doc_id", k)
          .select(col("gram"), col("id"), col("p"))
        val json = occ.toJSON.collect().mkString("\n")
        Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
        q.processAllAvailable()
      }
      spark.table(name).as[GramVerdict].collect()
        .map(v => (v.id, v.p) -> v.dup).toMap
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  /** Gaps-and-islands span rebuild from a doc set's dup verdicts — the
    * batch operator's merge rule (intervals [p, p+k-1] merge when the
    * gap is zero). */
  private def rebuild(verdicts: Map[(Long, Long), Long], ids: Set[Long],
      k: Int): Set[(Long, Long, Long, Long)] =
    verdicts.toSeq.collect {
      case ((id, p), dup) if ids(id) && dup == 1L => (id, p)
    }.groupBy(_._1).flatMap { case (id, rows) =>
      val ps = rows.map(_._2).sorted
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      ps.foreach { p =>
        if (spans.nonEmpty && p <= spans.last._2 + 1L)
          spans(spans.length - 1) = (spans.last._1,
            math.max(spans.last._2, p + k - 1L))
        else spans += ((p, p + k - 1L))
      }
      spans.map { case (s, e) => (id, s, e, e - s + 1L) }
    }.toSet

  private def batchSpans(docs: org.apache.spark.sql.DataFrame, k: Int,
      ids: Set[Long]): Set[(Long, Long, Long, Long)] =
    TextAnalysis.dupSpans(docs, "text", "doc_id", k)
      .as[(Long, Long, Long, Long)].collect().filter(r => ids(r._1)).toSet

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
    val got = runStream("substr_prefix", slices, k = 8)
    val prefixes = Seq(
      docs.filter(col("doc_id") <= cut1),
      docs.filter(col("doc_id") <= cut2),
      docs)
    val sliceIds = Seq(
      ids.filter(_ <= cut1).toSet,
      ids.filter(i => i > cut1 && i <= cut2).toSet,
      ids.filter(_ > cut2).toSet)
    prefixes.zip(sliceIds).foreach { case (prefix, inSlice) =>
      val want = batchSpans(prefix, 8, inSlice)
      val have = rebuild(got, inSlice, 8)
      assert(have === want)
    }
    // the fixture exercises the positive path: some span somewhere
    assert(got.values.exists(_ == 1L), "no duplicated gram on the fixture")
  }

  test("cross-batch carry: a gram repeated in a LATER batch flips only " +
      "the later occurrence; one-batch arrival flips both") {
    val a = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val b = Seq((2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "wholly unrelated words here all six")).toDF("doc_id", "text")
    val got = runStream("substr_carry", Seq(a, b), k = 4)
    // doc 1 streamed first: all its windows were fresh → no dup verdicts
    assert(got.collect { case ((1L, _), d) => d }.forall(_ == 0L))
    // doc 2 repeats doc 1's text in a later batch → every window dup
    val doc2 = got.collect { case ((2L, _), d) => d }
    assert(doc2.nonEmpty && doc2.forall(_ == 1L))
    assert(got.collect { case ((3L, _), d) => d }.forall(_ == 0L))
    // the SAME two docs arriving in ONE batch mark both as dup — the
    // post-batch-count semantics the batch operator has
    val both = runStream("substr_onebatch",
      Seq(Seq((1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")), k = 4)
    assert(both.nonEmpty && both.values.forall(_ == 1L))
  }

  test("within-document repeats count, as in the batch formulation") {
    // one doc whose k-gram repeats internally: count 2 in a single doc
    val d = Seq((7L, "x y x y x y")).toDF("doc_id", "text")
    val got = runStream("substr_withindoc", Seq(d), k = 4)
    // windows: "x y x y"(p=1), "y x y x"(p=2), "x y x y"(p=3) — the
    // repeated window dups positions 1 and 3; batch agrees
    assert(got((7L, 1L)) == 1L && got((7L, 3L)) == 1L)
    assert(got((7L, 2L)) == 0L)
    assert(rebuild(got, Set(7L), 4) === batchSpans(d, 4, Set(7L)))
  }
}
