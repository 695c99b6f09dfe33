package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.state.AtomicTable
import graft.streaming.StreamingCountMaintenance

/** The streaming count-maintenance twin must equal the batch fold over
  * any slicing, survive adds AND retractions across batches, and —
  * since the fold is additive, not idempotent — replaying a crashed
  * micro-batch must NOT double-count: the batch-versioned state commit
  * is what makes that hold. */
class StreamingCountMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def counts(df: DataFrame): Map[String, Long] =
    Dedup.shingleStream(df, "text", "doc_id", n = 3)
      .groupBy(col("s")).agg(count(lit(1)).as("c123"))
      .as[(String, Long)].collect().toMap

  private def stored(dir: String): Map[String, Long] =
    new AtomicTable(spark, dir)
      .read(StreamingCountMaintenance.stateSchema)
      .as[(String, Long)].collect().toMap

  private val d1 = (1L, "the cat sat on the mat and slept all day")
  private val d2 = (2L, "a dog ran over the hill and came back home")
  private val d3 = (3L, "the cat sat on the mat every single day here")

  private def writeBatch(inDir: String, name: String,
      rows: Seq[(Long, String, Int)]): Unit =
    Files.writeString(Paths.get(s"$inDir/$name.json"),
      rows.map { case (id, t, op) =>
        s"""{"doc_id":$id,"text":"$t","op":$op}""" }.mkString("\n"))

  test("sliced changelog (adds then a retract batch) equals the batch " +
      "fold over the net corpus") {
    val root = Files.createTempDirectory("graft-scm").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, op INT").json(inDir)
    val q = StreamingCountMaintenance.start(stream, "text", "doc_id",
      "op", s"$root/state", s"$root/ckpt")
    try {
      writeBatch(inDir, "b0", Seq((d1._1, d1._2, 1), (d2._1, d2._2, 1)))
      q.processAllAvailable()
      assert(stored(s"$root/state") ===
        counts(Seq(d1, d2).toDF("doc_id", "text")))
      writeBatch(inDir, "b1", Seq((d3._1, d3._2, 1), (d2._1, d2._2, -1)))
      q.processAllAvailable()
      assert(stored(s"$root/state") ===
        counts(Seq(d1, d3).toDF("doc_id", "text")))
    } finally q.stop()
  }

  test("crash after the state commit, before the checkpoint: the " +
      "replayed batch re-publishes the SAME image — counts are not " +
      "doubled, and the next batch continues correctly") {
    val root = Files.createTempDirectory("graft-scmcrash").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val table = new AtomicTable(spark, s"$root/state")
    def stream = spark.readStream
      .schema("doc_id LONG, text STRING, op INT").json(inDir)

    // run 1: the state commit LANDS, then the batch fails — Spark never
    // advances the checkpoint, so restart replays batch 0
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q1 = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        StreamingCountMaintenance.applyBatch(table, b, id, "text",
          "doc_id", "op")
        if (!crashed.getAndSet(true))
          throw new RuntimeException("injected crash after state commit")
      }.start()
    writeBatch(inDir, "b0", Seq((d1._1, d1._2, 1), (d2._1, d2._2, 1)))
    val boom = intercept[Exception] { q1.processAllAvailable() }
    assert(boom.getMessage.contains("injected crash")
      || Option(boom.getCause).exists(
        _.getMessage.contains("injected crash")))
    q1.stop()
    val once = counts(Seq(d1, d2).toDF("doc_id", "text"))
    assert(stored(s"$root/state") === once,
      "the crashed batch's commit must have landed")

    // run 2: same checkpoint — batch 0 replays; an additive re-apply
    // would DOUBLE every count, the versioned re-publish must not
    val q2 = StreamingCountMaintenance.start(stream, "text", "doc_id",
      "op", s"$root/state", s"$root/ckpt")
    try {
      q2.processAllAvailable()
      assert(stored(s"$root/state") === once,
        "replay must re-publish, not re-apply")
      writeBatch(inDir, "b1", Seq((d3._1, d3._2, 1)))
      q2.processAllAvailable()
      assert(stored(s"$root/state") ===
        counts(Seq(d1, d2, d3).toDF("doc_id", "text")))
    } finally q2.stop()
  }

  test("batch-id gaps (empty batches) are safe: reads resolve to the " +
      "highest committed version at or below the batch id") {
    val root = Files.createTempDirectory("graft-scmgap").toString
    val table = new AtomicTable(spark, s"$root/state")
    // simulate batches 0, then 3 (1-2 empty → never committed)
    StreamingCountMaintenance.applyBatch(table,
      Seq((d1._1, d1._2, 1)).toDF("doc_id", "text", "op"), 0L,
      "text", "doc_id", "op")
    StreamingCountMaintenance.applyBatch(table,
      Seq((d3._1, d3._2, 1)).toDF("doc_id", "text", "op"), 3L,
      "text", "doc_id", "op")
    assert(stored(s"$root/state") ===
      counts(Seq(d1, d3).toDF("doc_id", "text")))
    // and a REPLAY of batch 3 after its commit still reads the batch-0
    // image (GC kept the actual previous counter, not counter-1)
    StreamingCountMaintenance.applyBatch(table,
      Seq((d3._1, d3._2, 1)).toDF("doc_id", "text", "op"), 3L,
      "text", "doc_id", "op")
    assert(stored(s"$root/state") ===
      counts(Seq(d1, d3).toDF("doc_id", "text")))
  }

  test("classifier variant: sliced labeled changelog equals the batch " +
      "recount over the net corpus, and replay does not double-count") {
    import graft.operators.NaiveBayes
    val root = Files.createTempDirectory("graft-scm-nbc").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    def gc(rows: Seq[(Long, String, String)]): Map[(String, String), Long] =
      NaiveBayes.trainGramCounts(rows.toDF("doc_id", "lang", "text"),
          "text", "lang")
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    def st(): Map[(String, String), Long] =
      new AtomicTable(spark, s"$root/state")
        .read(StreamingCountMaintenance.classifierStateSchema)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val e1 = (1L, "en", "the cat sat here")
    val e2 = (2L, "fr", "le chat est la")
    val e3 = (3L, "en", "a dog ran home")
    def w(name: String, rows: Seq[(Long, String, String, Int)]): Unit =
      Files.writeString(Paths.get(s"$inDir/$name.json"),
        rows.map { case (id, l, t, op) =>
          s"""{"doc_id":$id,"lang":"$l","text":"$t","op":$op}""" }
          .mkString("\n"))
    val stream = spark.readStream
      .schema("doc_id LONG, lang STRING, text STRING, op INT").json(inDir)
    val q = StreamingCountMaintenance.startClassifier(stream, "text",
      "lang", "op", s"$root/state", s"$root/ckpt")
    try {
      w("b0", Seq((e1._1, e1._2, e1._3, 1), (e2._1, e2._2, e2._3, 1)))
      q.processAllAvailable()
      assert(st() === gc(Seq(e1, e2)))
      w("b1", Seq((e3._1, e3._2, e3._3, 1), (e2._1, e2._2, e2._3, -1)))
      q.processAllAvailable()
      assert(st() === gc(Seq(e1, e3)))
    } finally q.stop()
    // replay of the last batch against its versioned pre-image: same
    // result, no double-count (the additive-fold crash contract)
    val table = new AtomicTable(spark, s"$root/state")
    StreamingCountMaintenance.applyClassifierBatch(table,
      Seq((e3._1, e3._2, e3._3, 1), (e2._1, e2._2, e2._3, -1))
        .toDF("doc_id", "lang", "text", "op"), 1L, "text", "lang", "op")
    assert(st() === gc(Seq(e1, e3)))
  }
}
