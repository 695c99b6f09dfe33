package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins for the memo lifecycle:
  *
  *  1. loss recovery — `localCheckpoint`-backed memos are lineage-free,
  *     so the documented recovery path after losing their blocks is to
  *     drop the cache entry and rebuild from the parquet inputs
  *     (SCALING.md "Memoized checkpoints: loss recovery"). The rebuild
  *     must be bit-identical: every memo is a pure derivation of the
  *     immutable fixture.
  *  2. planning-only warm — Bench's warm loop runs with
  *     `SparkEntry.planningOnly` set, so a query whose family memo is
  *     unbuilt must raise [[SparkEntry.MemoDeferred]] (and be built
  *     later inside its timed `__memo:<name>` slot) instead of silently
  *     materializing corpus-sized work in an uncharged phase; a memo
  *     that IS built must keep serving in planning-only mode.
  */
class MemoRecoverySpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("dropped memo rebuilds from the inputs, bit-identical") {
    // vocab_topk rides the unigram-count memo, which itself rides the
    // postings memo — the drop exercises a two-deep rebuild chain
    val q = SparkEntry.queries("vocab_topk")
    val before = q(spark, dir).collect().map(_.toString).sorted
    SparkEntry.dropMemos(spark, dir)
    val after = q(spark, dir).collect().map(_.toString).sorted
    assert(before.sameElements(after),
      "memo rebuild after loss must be bit-identical")
  }

  test("planning-only: unbuilt memo defers, built memo serves") {
    SparkEntry.dropMemos(spark, dir)
    val q = SparkEntry.queries("bigram_topk")
    SparkEntry.planningOnly = true
    try {
      intercept[SparkEntry.MemoDeferred] { q(spark, dir).schema }
    } finally SparkEntry.planningOnly = false
    // build normally, then planning-only analysis must succeed
    q(spark, dir).schema
    SparkEntry.planningOnly = true
    try q(spark, dir).schema
    finally SparkEntry.planningOnly = false
  }

  test("every memo builder is invocable and idempotent on a warm cache") {
    // builders must be callable in declared order (dependencies first) —
    // a second pass over a warm cache must be instant cache hits, not
    // rebuilds (same frame instance for the DataFrame-valued memos)
    SparkEntry.memoBuilders.foreach { case (_, b) => b(spark, dir) }
    SparkEntry.memoBuilders.foreach { case (_, b) => b(spark, dir) }
  }
}
