package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, TextAnalysis}

class AsofTextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("asof join: latest right at-or-before, >= tie visibility, null when none") {
    val left = Seq(
      ("k1", 10L, "l_a"), // after r@5  -> 5
      ("k1", 20L, "l_b"), // after r@15 -> 15
      ("k1", 15L, "l_c"), // EQUAL to r@15 -> 15 (>= semantics)
      ("k1", 3L, "l_d"),  // before any right -> null
      ("k2", 50L, "l_e"), // key with no rights at all -> null
      ("k3", 9L, "l_f")   // right exists only at same key k3
    ).toDF("k", "ts", "lv")
    val right = Seq(
      ("k1", 5L, 100L), ("k1", 15L, 101L), ("k3", 1L, 102L),
      ("k9", 1L, 103L) // right-only key never surfaces
    ).toDF("k", "ts", "rid")

    val out = AsofJoin.asof(left, right, "k", "ts", Seq("rid"),
        rightTieBreak = Seq("rid"))
      .select("lv", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(out === Map(
      "l_a" -> Some(100L), "l_b" -> Some(101L), "l_c" -> Some(101L),
      "l_d" -> None, "l_e" -> None, "l_f" -> Some(102L)))
  }

  test("asof join: tie among right rows at one (key, ts) -> max tiebreak wins") {
    val left = Seq(("k", 10L, "l")).toDF("k", "ts", "lv")
    val right = Seq(("k", 10L, 1L), ("k", 10L, 7L), ("k", 10L, 3L))
      .toDF("k", "ts", "rid")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("rid"),
        rightTieBreak = Seq("rid"))
      .select("asof_rid").as[Long].collect()
    assert(out.toSeq === Seq(7L))
  }

  test("asof join: forward direction — earliest right at-or-after") {
    val left = Seq(
      ("k1", 10L, "l_a"), // before r@15 -> 15
      ("k1", 15L, "l_b"), // EQUAL to r@15 -> 15 (equality visible)
      ("k1", 16L, "l_c"), // only r@30 remains -> 30
      ("k1", 40L, "l_d"), // after every right -> null
      ("k2", 1L, "l_e")   // no rights for key -> null
    ).toDF("k", "ts", "lv")
    val right = Seq(("k1", 15L, 101L), ("k1", 30L, 102L))
      .toDF("k", "ts", "rid")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("rid"),
        rightTieBreak = Seq("rid"), direction = "forward")
      .select("lv", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(out === Map(
      "l_a" -> Some(101L), "l_b" -> Some(101L), "l_c" -> Some(102L),
      "l_d" -> None, "l_e" -> None))
  }

  test("asof join: tolerance nulls matches beyond the window") {
    val left = Seq(("k", 100L, "near"), ("k", 200L, "far"))
      .toDF("k", "ts", "lv")
    val right = Seq(("k", 95L, 7L)).toDF("k", "ts", "rid")
    // numeric timeline, tolerance 10 ticks: match@95 is kept for ts=100
    // (distance 5) and dropped for ts=200 (distance 105)
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("rid"),
        rightTieBreak = Seq("rid"),
        tolerance = Some(org.apache.spark.sql.functions.lit(10L)))
      .select("lv", "asof_rid").as[(String, Option[Long])].collect().toMap
    assert(out === Map("near" -> Some(7L), "far" -> None))
  }

  test("asof join: multi-column payload and null-ts right rows excluded") {
    val left = Seq(("k", 10L, "l1"), ("k", 2L, "l2")).toDF("k", "ts", "lv")
    val right = Seq(
      (("k"), Some(5L), 100L, "state-a"),
      (("k"), None: Option[Long], 999L, "no-timeline")) // must never match
      .toDF("k", "ts", "rid", "rstate")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("rid", "rstate"),
        rightTieBreak = Seq("rid"))
      .select("lv", "asof_rid", "asof_rstate")
      .as[(String, Option[Long], Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    assert(out("l1") === ((Some(100L), Some("state-a"))))
    assert(out("l2") === ((None, None))) // before any VALID right row
  }

  test("dup-token permille: all-same vs all-distinct") {
    val df = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "x x y y"))
      .toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.dupTokenPermille(col("text")).as("p"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 750L, 2L -> 0L, 3L -> 500L))
  }

  test("top-bigram concentration: repeated bigram dominates") {
    // "a b a b a b" -> bigrams: (a b)x3, (b a)x2 -> top 3/5 = 600
    val df = Seq((1L, "a b a b a b"), (2L, "q")).toDF("id", "text")
    val out = TextAnalysis.topBigramConcentration(df, "text", "id")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 600L)) // id 2 has no bigrams -> no row
  }

  test("hash split: deterministic, content-keyed, covers all three splits") {
    val docs = (0 until 200).map(i => (i.toLong, s"doc number $i"))
      .toDF("id", "text")
    val a = docs.select(col("id"), TextAnalysis.hashSplit(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    val b = docs.repartition(7)
      .select(col("id"), TextAnalysis.hashSplit(col("text")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(a === b) // stable under repartitioning
    assert(a.values.toSet === Set("train", "val", "test"))
    // identical content -> identical split regardless of id
    val dup = Seq((900L, "doc number 3")).toDF("id", "text")
      .select(TextAnalysis.hashSplit(col("text"))).as[String].head()
    assert(dup === a(3L))
  }

  test("pii redact: emails replaced, counts right, clean text untouched") {
    val df = Seq(
      (1L, "reach me at bob.smith+x@corp.example.org or alice@ex.io thanks"),
      (2L, "no addresses here @ not-an-email x@y"),
      (3L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.piiEmailCount(col("text")).as("n"),
        TextAnalysis.piiRedact(col("text")).as("r"))
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((2, "reach me at [EMAIL] or [EMAIL] thanks")))
    assert(out(2L) === ((0, "no addresses here @ not-an-email x@y")))
    assert(out(3L) === ((0, "")))
  }

  test("chunking: sliding windows with overlap, truncated tail, 1-token doc") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "solo")).toDF("id", "text")
    val out = TextAnalysis.chunkDocs(df, "text", "id", width = 4, stride = 2)
      .as[(Long, Int, String)].collect().toSet
    assert(out === Set(
      (1L, 1, "a b c d"), (1L, 3, "c d e f"), (1L, 5, "e f g h"),
      (1L, 7, "g h i j"), (1L, 9, "i j"),
      (2L, 1, "solo")))
  }

  test("vocab top-k: counts and tie order") {
    val df = Seq("b a", "b c a", "b").toDF("text")
    val out = TextAnalysis.vocabTopK(df, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(out === Seq(("b", 3L), ("a", 2L))) // a beats c on count; then token asc
  }
}
