package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.BpeEncode
import graft.operators.TextAnalysis

/** Pins for the BPE apply expression (the `bpe_apply` query is rows-only —
  * the merge replay has no SQL twin; these vectors are the evidence). */
class BpeEncodeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("trained merges replay to hand-computed token counts") {
    // corpus: 'low' ×3, 'lower' ×1. pair counts round 1: (l,o)=4,
    // (o,w)=4, (w,e)=1, (e,r)=1 → tie (l,o) vs (o,w) broken px asc →
    // merge 1 = 'l o'. round 2: (lo,w)=4 wins → merge 2 = 'lo w'.
    val docs = Seq((1L, "low low low lower")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", iters = 2)
      .orderBy("iter").collect().map(_.getString(1)).toList
    assert(merges === List("l o", "lo w"))
    val table = merges.map { m =>
      val p = m.split(" "); (p(0), p(1)) }
    // encode: 'low' → [low] (1); 'lower' → [low, e, r] (3)
    import org.apache.spark.unsafe.types.UTF8String
    val arr = table.map(t => Array(t._1, t._2)).toArray
    assert(BpeEncode.count(UTF8String.fromString("low"), arr) === 1L)
    assert(BpeEncode.count(UTF8String.fromString("lower"), arr) === 3L)
    assert(BpeEncode.count(UTF8String.fromString("low low lower"), arr) === 5L)
    // untrained word falls back to characters
    assert(BpeEncode.count(UTF8String.fromString("xyz"), arr) === 3L)
    // merged symbol re-merges with the NEXT symbol in the same pass
    // ('l o' then 'lo w': "llow" → l,l,o,w → l,lo,w → l,low)
    assert(BpeEncode.count(UTF8String.fromString("llow"), arr) === 2L)
  }

  test("catalyst expression: codegen parity, casing/whitespace, nulls") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val rows = Seq("LOW  lower\tlow", "", "   ", "abc")
    val df = rows.toDF("s")
    val got = df.select(BpeEncode(col("s"), merges).as("n"))
      .collect().map(_.getLong(0)).toList
    // "LOW lower low" lowercases → 1 + 3 + 1; blanks → 0; abc → 3 chars
    assert(got === List(5L, 0L, 0L, 3L))
    val withNull = df.select(
      BpeEncode(when(col("s") === "abc", null).otherwise(col("s")),
        merges).as("n"))
    assert(withNull.collect().count(_.isNullAt(0)) === 1)
  }

  test("envelope: wordcount <= n_bpe <= charcount on real fixture docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val merges = TextAnalysis.bpeMerges(docs, "text", iters = 5)
      .orderBy("iter").collect()
      .map { r => val p = r.getString(1).split(" "); (p(0), p(1)) }.toSeq
    val checked = docs.select(
        BpeEncode(col("text"), merges).as("n_bpe"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long")
          .as("n_ch"))
      .as[(Long, Long, Long)].collect()
    checked.foreach { case (nb, nw, nc) =>
      assert(nb >= nw, s"bpe $nb < words $nw")
      assert(nb <= nc, s"bpe $nb > chars $nc")
    }
    // merges must actually compress: total bpe < total chars
    assert(checked.map(_._1).sum < checked.map(_._3).sum)
  }
}
