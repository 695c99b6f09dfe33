package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.streaming.{DocRow, FpRow, StatefulWinnow, WinnowHit}

/** Streaming winnowing must equal the batch MOSS tier on the same corpus:
  * the per-doc fingerprint flatMap must emit the EXACT (id, pos, fp) rows
  * `TextAnalysis.winnowFingerprints` computes, and the df-capped
  * fingerprint store fed in arbitrary in-order micro-batch slices must
  * score to the EXACT pair set the batch `winnow_pairs` aggregate
  * produces — breaches included (the tombstone voids a boilerplate
  * fingerprint's earlier hits just as the batch tier's retrospective
  * df cap drops the fingerprint entirely). */
class StreamingWinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("per-doc fingerprint flatMap == batch winnowFingerprints, bit-exact") {
    val want = TextAnalysis.winnowFingerprints(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val got = docs.collect().iterator.flatMap { r =>
      StatefulWinnow.fingerprintsOf(r.getLong(0), r.getString(1), 8, 4)
    }.map(f => (f.doc_id, f.pos, f.fp)).toSeq.sorted
    assert(got.nonEmpty)
    assert(got === want)
    // null-text parity: batch hashes substring(null, …) to the raw
    // xxhash64 seed at position 1 — the flatMap must mirror it
    import spark.implicits._
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("doc_id", "text")
    val wantNull = TextAnalysis.winnowFingerprints(withNull, "text",
        "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val gotNull = withNull.collect().iterator.flatMap { r =>
      StatefulWinnow.fingerprintsOf(r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), 8, 4)
    }.map(f => (f.doc_id, f.pos, f.fp)).toSeq.sorted
    assert(gotNull === wantNull)
  }

  private def runStream(name: String,
      slices: Seq[org.apache.spark.sql.DataFrame],
      maxDf: Int, ttl: Option[java.time.Duration] = None,
      expectRows: Option[Long] = None): Seq[WinnowHit] = {
    import spark.implicits._
    val root = Files.createTempDirectory(s"graft-$name").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").json(inDir).as[DocRow]
    val hits = StatefulWinnow.hits(
      StatefulWinnow.fingerprintStream(stream)
        .dropDuplicates("doc_id", "fp").as[FpRow], maxDf, ttl)
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = hits.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName(name).start()
    try {
      if (ttl.isEmpty) {
        slices.zipWithIndex.foreach { case (slice, i) =>
          val json = slice.toJSON.collect().mkString("\n")
          Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
          q.processAllAvailable()
        }
      } else {
        // ProcessingTime mode runs no-data batches for timer bookkeeping,
        // so processAllAvailable never settles — poll the sink instead
        slices.zipWithIndex.foreach { case (slice, i) =>
          val json = slice.toJSON.collect().mkString("\n")
          Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
        }
        val want = expectRows.getOrElse(
          sys.error("TTL mode needs expectRows"))
        val deadline = System.currentTimeMillis() + 300000
        while (spark.table(name).count() < want) {
          q.exception.foreach(throw _)
          assert(System.currentTimeMillis() < deadline,
            s"timed out: ${spark.table(name).count()}/$want rows")
          Thread.sleep(500)
        }
      }
      spark.table(name).as[WinnowHit].collect().toSeq
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("stream-vs-batch parity: 3 micro-batch slices == batch winnow_pairs") {
    // batch twin at the engine's constants: distinct per-doc fps,
    // df cap, pair overlap count; threshold derived from the fixture so
    // it provably bites
    val fp = TextAnalysis.winnowFingerprints(docs, "text", "doc_id")
      .select(col("id"), col("fp")).distinct().localCheckpoint()
    val rare = fp.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= TextAnalysis.WinnowMaxDf).select(col("fp"))
    val kept = fp.join(rare, Seq("fp"), "left_semi")
    val overlaps = kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    val minShared = overlaps.agg(max(col("n_shared"))).head()
      .getLong(0).toInt
    assert(minShared >= 2, s"degenerate fixture: max overlap $minShared")
    val want = overlaps.filter(col("n_shared") >= minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq

    val slices = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    val hitRows = runStream("winnow_parity", slices,
      TextAnalysis.WinnowMaxDf)
    import spark.implicits._
    val got = StatefulWinnow.scoreHits(
        hitRows.toDF().select(col("a"), col("b"), col("fp")), minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("TTL mode: same hit parity within the window (timer path runs)") {
    import spark.implicits._
    // TTL far beyond the test's wall time → no eviction → the hit stream
    // equals the no-TTL run; exercises TTLConfig + ProcessingTime mode
    val two = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    // expected sink rows = Σ C(df, 2) over this corpus's distinct fps
    val fp = StatefulWinnow.fingerprintStream(two.as[graft.streaming.DocRow])
      .dropDuplicates("doc_id", "fp")
    val wantRows = fp.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("m"))
      .agg(sum(expr("m * (m - 1) DIV 2"))).head().getLong(0)
    assert(wantRows > 0, "degenerate corpus: no shared fingerprints")
    val got = runStream("winnow_ttl",
      Seq(two.filter(col("doc_id") <= 1), two.filter(col("doc_id") > 1)),
      maxDf = 0, ttl = Some(java.time.Duration.ofHours(1)),
      expectRows = Some(wantRows))
    assert(got.map(h => (h.a, h.b)).toSet === Set((1L, 2L)))
    assert(got.size.toLong === wantRows)
  }

  test("df breach voids a fingerprint's earlier hits across micro-batches") {
    import spark.implicits._
    // three exact dups (every shared fp breaches at maxDf = 2, with the
    // breach arriving one batch AFTER hits were already emitted) plus an
    // exact pair that stays under the cap
    val tripled = "the winnow breach corpus sentence alpha beta gamma"
    val paired = "an entirely different pair document delta epsilon zeta"
    val b1 = Seq((1L, tripled), (2L, tripled), (10L, paired))
      .toDF("doc_id", "text")
    val b2 = Seq((3L, tripled), (11L, paired)).toDF("doc_id", "text")
    val hitRows = runStream("winnow_breach", Seq(b1, b2), maxDf = 2)
    val scored = StatefulWinnow.scoreHits(
        hitRows.toDF().select(col("a"), col("b"), col("fp")), 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the (1,2) hits were emitted in batch 1, then voided by batch 2's
    // tombstones; only the under-cap pair survives
    assert(scored === Set((10L, 11L)),
      s"got $scored from ${hitRows.size} hit rows")
    assert(hitRows.exists(_.a == -1L), "expected breach tombstones")
  }
}
