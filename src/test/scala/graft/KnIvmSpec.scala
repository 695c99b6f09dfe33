package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Incremental trigram-count maintenance must satisfy the `ivm_agg`
  * contract: maintained counts are BIT-EQUAL to a full recompute over
  * the post-delta corpus, retractions drive emptied trigrams to zero
  * (row removed), and a same-batch add+retract of one document is a
  * no-op. */
class KnIvmSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def counts(df: DataFrame): DataFrame =
    Dedup.shingleStream(df, "text", "doc_id", n = 3)
      .groupBy(col("s")).agg(count(lit(1)).as("c123"))

  private def asMap(df: DataFrame): Map[String, Long] =
    df.as[(String, Long)].collect().toMap

  private val base = Seq(
    (1L, "the cat sat on the mat and the cat sat again"),
    (2L, "a dog ran over the hill and far away today"),
    (3L, "the cat sat on the mat every day we think"),
    (4L, "completely different words forming their own tail here now")
  ).toDF("doc_id", "text")

  private val adds = Seq(
    (5L, "the cat sat on a new rug this very morning"),
    (6L, "novel trigrams only in this added document appear once")
  ).toDF("doc_id", "text")

  test("maintained counts == full recompute over base - retracted + " +
      "added (bit-equal, including rows that changed and rows that " +
      "vanished)") {
    val retractIds = Set(2L, 3L)
    val delta = adds.withColumn("__op", lit(1)).unionByName(
      base.filter(col("doc_id").isin(retractIds.toSeq: _*))
        .withColumn("__op", lit(-1)))
    val maintained = TextAnalysis.maintainTrigramCounts(
      counts(base), delta, "text", "doc_id", "__op")
    val recomputed = counts(
      base.filter(!col("doc_id").isin(retractIds.toSeq: _*))
        .unionByName(adds))
    assert(asMap(maintained) === asMap(recomputed))
    // the fixture must exercise all three row fates
    val before = asMap(counts(base)); val after = asMap(maintained)
    assert((after.keySet -- before.keySet).nonEmpty, "no new trigrams")
    assert((before.keySet -- after.keySet).nonEmpty,
      "no trigram emptied to zero")
    assert(before.exists { case (s, c) =>
      after.get(s).exists(c2 => c2 != c) }, "no count changed in place")
  }

  test("retract-to-zero: retracting every base document converges to " +
      "the empty table") {
    val delta = base.withColumn("__op", lit(-1))
    assert(TextAnalysis.maintainTrigramCounts(
      counts(base), delta, "text", "doc_id", "__op").count() === 0)
  }

  test("kn3ModelFromCounts over MAINTAINED counts equals the model " +
      "built from scratch on the post-delta corpus (the refresh loop)") {
    val retractIds = Set(2L)
    val delta = adds.withColumn("__op", lit(1)).unionByName(
      base.filter(col("doc_id").isin(retractIds.toSeq: _*))
        .withColumn("__op", lit(-1)))
    val refreshed = TextAnalysis.kn3ModelFromCounts(
      TextAnalysis.maintainTrigramCounts(
        counts(base), delta, "text", "doc_id", "__op"))
    val scratch = TextAnalysis.kn3Model(
      base.filter(!col("doc_id").isin(retractIds.toSeq: _*))
        .unionByName(adds), "text", "doc_id")
    def dump(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(dump(refreshed.kept) === dump(scratch.kept))
    assert(dump(refreshed.ctx) === dump(scratch.ctx))
    assert(dump(refreshed.cont) === dump(scratch.cont))
    assert(dump(refreshed.mid) === dump(scratch.mid))
    assert(dump(refreshed.uni) === dump(scratch.uni))
    assert(dump(refreshed.types) === dump(scratch.types))
  }

  test("add then retract of the same document in one batch is a no-op") {
    val doc = adds.filter(col("doc_id") === 5L)
    val delta = doc.withColumn("__op", lit(1))
      .unionByName(doc.withColumn("__op", lit(-1)))
    val maintained = TextAnalysis.maintainTrigramCounts(
      counts(base), delta, "text", "doc_id", "__op")
    assert(asMap(maintained) === asMap(counts(base)))
  }
}
