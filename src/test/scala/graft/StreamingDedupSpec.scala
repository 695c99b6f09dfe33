package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.{BandKeyed, LshCandidate, StatefulLshDedup}

/** Streaming MinHash-LSH near-dup candidates must equal the batch tier on
  * the same corpus: per-band bucket state carried across micro-batches by
  * `transformWithState` replaces the batch band-key self-join, so feeding
  * the documents fixture in slices must surface EXACTLY the candidate
  * pair set `Dedup.minhashLshCandidates` computes over the whole corpus
  * at once. */
class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Band-keyed rows of the fixture's documents, bucket key = the same
    * (band, xxhash64-slice) values the batch self-join collides on. */
  private def bandRows = {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val sigs = Dedup.minhashSignature(docs, "text", "doc_id", k = 64, n = 5)
    Dedup.lshBandKeys(sigs, k = 64, r = 4)
      .select(concat_ws(":", col("bk.band"), col("bk.bh")).as("bucket"),
        col("id").as("doc_id"))
  }

  private def runStream(name: String, slices: Seq[org.apache.spark.sql.DataFrame],
      maxBucket: Int = 0, ttl: Option[java.time.Duration] = None,
      expectRows: Option[Long] = None): Seq[LshCandidate] = {
    import spark.implicits._
    val root = Files.createTempDirectory(s"graft-$name").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("bucket STRING, doc_id LONG").json(inDir).as[BandKeyed]
    val cands = StatefulLshDedup.candidates(stream, maxBucket, ttl)
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    // state partition count is fixed at query start from this conf: 4
    // RocksDB stores per batch instead of 32 (pure test-latency knob —
    // the ~5k buckets of the fixture don't need 32 stores)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = cands.writeStream.outputMode("append")
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
        // ProcessingTime mode (forced by TTL) runs no-data batches for
        // timer bookkeeping, so processAllAvailable never settles — write
        // everything, then poll the sink for the expected row count
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
      spark.table(name).as[LshCandidate].collect().toSeq
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("stream-vs-batch parity: 3 micro-batch slices == whole-corpus LSH") {
    import spark.implicits._
    val rows = bandRows.cache()
    try {
      val slices = (0 until 3).map(i => rows.filter(col("doc_id") % 3 === i))
      val got = runStream("lsh_parity", slices)
        .map(c => (c.a, c.b)).toSet
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val sigs = Dedup.minhashSignature(docs, "text", "doc_id", k = 64, n = 5)
      val want = Dedup.minhashLshCandidates(sigs, k = 64, r = 4)
        .as[(Long, Long)].collect().toSet
      assert(want.nonEmpty, "fixture should contain near-dup candidates")
      assert(got === want,
        s"stream candidates drifted: missing=${want -- got} extra=${got -- want}")
    } finally rows.unpersist()
  }

  test("TTL mode: same parity within the window; bucket cap is prospective") {
    import spark.implicits._
    val rows = bandRows.cache()
    try {
      // TTL far beyond the test's wall time → no eviction → full parity,
      // but the processing-time TTL path (timeMode, state TTLConfig) runs
      val slices = Seq(rows.filter(col("doc_id") % 2 === 0),
        rows.filter(col("doc_id") % 2 === 1))
      // expected sink rows = one per (bucket, pair) collision: Σ C(m, 2)
      val collisions = rows.groupBy(col("bucket"))
        .agg(countDistinct(col("doc_id")).as("m"))
        .agg(sum(expr("m * (m - 1) DIV 2"))).head().getLong(0)
      val got = runStream("lsh_ttl", slices,
          ttl = Some(java.time.Duration.ofHours(1)),
          expectRows = Some(collisions))
        .map(c => (c.a, c.b)).toSet
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      val sigs = Dedup.minhashSignature(docs, "text", "doc_id", k = 64, n = 5)
      val want = Dedup.minhashLshCandidates(sigs, k = 64, r = 4)
        .as[(Long, Long)].collect().toSet
      assert(got === want)
      // prospective cap: a full bucket admits no new residents, so with
      // cap=1 every bucket keeps only its first doc and candidates are
      // exactly (first-resident, later) pairs — never resident-resident
      val capped = runStream("lsh_cap", slices, maxBucket = 1)
      val perBucketFirst = capped.groupBy(_.bucket)
      perBucketFirst.foreach { case (_, cs) =>
        assert(cs.map(c => Set(c.a, c.b)).reduce(_ intersect _).nonEmpty ||
          cs.size <= 1,
          "cap=1 bucket must pair everything against its single resident")
      }
      assert(capped.map(c => (c.a, c.b)).toSet.subsetOf(got))
    } finally rows.unpersist()
  }
}
