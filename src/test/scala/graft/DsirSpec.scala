package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** DSIR importance-weight pins: the native PolyHash31 bucket hash (value
  * contract vs the historical interpreted fold AND a Scala code-point
  * reference), the single-scan/ReusedExchange plan shape the round-8
  * verdict asked for, and the log-space variant's fixture parity with
  * the integer oracle path. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Scala reference: h = (h*31 + codePoint) mod 2^20, the value the
    * DuckDB twin folds with unicode(c) over split(s, ''). */
  private def ref(s: String): Long = {
    var a = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      a = (a * 31L + cp) % 1048576L
      i += Character.charCount(cp)
    }
    a
  }

  private val strs = Seq("", "a", "hello world", "alpha beta", "Z9 ~!",
    "café bar", "é中文", "😀 x", "x" * 300)

  test("PolyHash31 matches the code-point contract (eval + codegen paths)") {
    // local relation → constant-folded driver-side → exercises nullSafeEval
    val evalVals = strs.toDF("s")
      .select(graft.functions.PolyHash31(col("s"))).as[Long].collect()
    assert(evalVals.toSeq == strs.map(ref))
    // repartition blocks local-relation collapse → executor codegen path
    val cgVals = strs.toDF("s").repartition(2)
      .select(col("s"), graft.functions.PolyHash31(col("s")).as("h"))
      .as[(String, Long)].collect().toMap
    strs.foreach(s => assert(cgVals(s) == ref(s), s"codegen mismatch on '$s'"))
  }

  test("PolyHash31 equals the historical interpreted ascii() fold on ASCII") {
    val ascii = strs.filter(_.forall(_ < 128))
    val interp = ascii.toDF("s").repartition(2)
      .select(col("s"), expr(
        "aggregate(sequence(1, length(s)), 0L, " +
          "(a, i) -> pmod(a * 31L + ascii(substring(s, i, 1)), 1048576L))")
        .as("h"))
      .as[(String, Long)].collect().toMap
    ascii.foreach(s => assert(interp(s) == ref(s), s"fold mismatch on '$s'"))
  }

  test("dsirWeights plan: corpus featurized once (ckptLight pre-aggregate)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = TextAnalysis.dsirWeights(docs, "text", "doc_id",
      targetPred = col("lang") === "en", buckets = 4096)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the occurrence pre-aggregate is a materialized checkpoint: the
    // query plan reads it (twice — bucket rates + scoring join) and
    // NEVER re-scans / re-tokenizes the corpus
    assert(plan.contains("Scan ExistingRDD"),
      s"occAgg checkpoint missing from plan:\n$plan")
    val scans = plan.linesIterator.count(l => l.contains("FileScan parquet"))
    assert(scans == 0, s"corpus re-scanned $scans times post-checkpoint:\n$plan")
    assert(!plan.contains("Generate explode"),
      s"bigram explode re-executed inside the query plan:\n$plan")
  }

  test("log-space variant: identical backbone, order-compatible scores") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma", true),
      (3L, "alpha beta gamma beta gamma", false), // lookalike, untagged
      (4L, "zz yy xx ww vv uu", false),
      (5L, "solo", true) // sub-2-token: dropped by both paths
    ).toDF("doc_id", "text", "is_t")
    val intPath = TextAnalysis.dsirWeights(docs, "text", "doc_id",
        targetPred = col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val logPath = TextAnalysis.dsirWeightsLog(docs, "text", "doc_id",
        targetPred = col("is_t"), buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // same surviving ids, same n_bigrams per id (shared occAgg front end)
    assert(intPath.keySet == logPath.keySet && !intPath.contains(5L))
    intPath.foreach { case (id, (n, _)) => assert(logPath(id)._1 == n) }
    // the target-domain ordering signal survives the permille → log swap
    def avgLlr(id: Long) = logPath(id)._2 / logPath(id)._1
    assert(avgLlr(3L) > avgLlr(4L) && avgLlr(1L) > avgLlr(4L))
    assert((intPath(3L)._2 > intPath(4L)._2) == (avgLlr(3L) > avgLlr(4L)))
    logPath.values.foreach { case (_, llr) =>
      assert(!llr.isNaN && !llr.isInfinite)
    }
  }

  test("micros read-out tracks the double llr within the rounding bound") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dbl = TextAnalysis.dsirWeightsLog(docs, "text", "doc_id",
        targetPred = col("lang") === "en", buckets = 4096)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val mic = TextAnalysis.dsirWeightsLogMicros(docs, "text", "doc_id",
        targetPred = col("lang") === "en", buckets = 4096)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(dbl.keySet == mic.keySet && dbl.nonEmpty)
    // each occurrence contributes ≤ 0.5·k micros of quantization error, so
    // per document |llr_micros − llr·1e6| ≤ n_bigrams/2 (+1 for the final
    // double rounding)
    dbl.foreach { case (id, (n, llr)) =>
      val (nM, lm) = mic(id)
      assert(nM == n)
      assert(math.abs(lm - llr * 1e6) <= n / 2.0 + 1.0,
        s"doc $id: micros=$lm vs dbl*1e6=${llr * 1e6} (n=$n)")
    }
  }
}
