package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Exact-substring dedup family (dupSpans / spanCoverage /
  * substringExcise) and DSIR importance weights on hand-built corpora
  * where every expected span is checkable by eye. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // a1..a12 are distinct tokens; docs 1 and 2 share tokens 3..12 (ten
  // tokens = three overlapping 8-grams that must merge into ONE span);
  // doc 3 is all-unique; doc 4 is too short to window; doc 5 repeats an
  // 8-run WITHIN itself (within-doc repeats count, as in the
  // suffix-array formulation).
  private val run = (1 to 10).map(i => s"s$i").mkString(" ")
  private lazy val corpus = Seq(
    (1L, s"a1 a2 $run"),
    (2L, s"b1 $run b2 b3"),
    (3L, (1 to 12).map(i => s"u$i").mkString(" ")),
    (4L, "tiny doc only five tokens here"),
    (5L, s"$run c1 c2 $run")
  ).toDF("doc_id", "text")

  test("dupSpans merges overlapping windows into maximal spans") {
    val spans = TextAnalysis.dupSpans(corpus, "text", "doc_id", k = 8)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: shared run occupies tokens 3..12 -> one span, len 10
    assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 3L, 12L, 10L)))
    // doc 2: run at tokens 2..11
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 2L, 11L, 10L)))
    // doc 3 (unique) and doc 4 (short) contribute nothing
    assert(!spans.exists(s => s._1 == 3L || s._1 == 4L))
    // doc 5: run at 1..10 and again at 13..22; gap c1 c2 keeps them apart
    assert(spans.filter(_._1 == 5L).toSeq ==
      Seq((5L, 1L, 10L, 10L), (5L, 13L, 22L, 10L)))
  }

  test("dupSpans counts within-doc repeats without a second document") {
    val solo = Seq((9L, s"$run x1 x2 $run")).toDF("doc_id", "text")
    val spans = TextAnalysis.dupSpans(solo, "text", "doc_id", k = 8)
      .orderBy("span_start").collect()
    assert(spans.length == 2)
    assert(spans.map(_.getLong(1)).toSeq == Seq(1L, 13L))
  }

  test("spanCoverage keeps zero-dup docs and computes exact permille") {
    val cov = TextAnalysis.spanCoverage(corpus, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(cov.size == 5)
    assert(cov(1L) == (12L, 1L, 10L, 833L)) // 10000 DIV 12
    assert(cov(3L) == (12L, 0L, 0L, 0L))
    assert(cov(4L) == (6L, 0L, 0L, 0L))
    assert(cov(5L) == (22L, 2L, 20L, 909L))
  }

  test("substringExcise drops covered positions, keeps order, '' when all covered") {
    val out = TextAnalysis.substringExcise(corpus, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (12L, 2L, "a1 a2"))
    assert(out(2L) == (13L, 3L, "b1 b2 b3"))
    assert(out(3L)._3 == (1 to 12).map(i => s"u$i").mkString(" "))
    // a doc that is ONE duplicated run end to end rebuilds to ""
    val full = Seq((1L, run ++ " " ++ run.replace("s", "t")),
      (2L, run)).toDF("doc_id", "text")
    val fo = TextAnalysis.substringExcise(full, "text", "doc_id", k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(fo(2L) == (0L, ""))
  }

  test("dsirWeights favors target-domain lookalikes and sums exactly") {
    // target docs share a bigram vocabulary; the off-domain doc shares
    // none of it and must score a strictly lower average ratio
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma", true),
      (3L, "alpha beta gamma beta gamma", false), // lookalike, untagged
      (4L, "zz yy xx ww vv uu", false)
    ).toDF("doc_id", "text", "is_t")
    val w = TextAnalysis.dsirWeights(docs, "text", "doc_id",
      targetPred = col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(w.size == 4)
    // n_bigrams = tokens - 1 per doc
    assert(w(1L)._1 == 4L && w(4L)._1 == 5L)
    // w_avg = weight DIV n_bigrams
    w.values.foreach { case (n, wt, avg) => assert(avg == wt / n) }
    // the lookalike outscores the alien doc
    assert(w(3L)._3 > w(4L)._3)
    assert(w(1L)._3 > w(4L)._3)
  }

  test("dsirWeights drops sub-2-token docs on both sides' semantics") {
    val docs = Seq((1L, "solo", true), (2L, "two tokens", true))
      .toDF("doc_id", "text", "is_t")
    val ids = TextAnalysis.dsirWeights(docs, "text", "doc_id",
      targetPred = col("is_t")).select("id").as[Long].collect().toSet
    assert(ids == Set(2L))
  }
}
