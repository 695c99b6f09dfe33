package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native Catalyst expression — the
  * entity-resolution scorer that tolerates transpositions and rewards a
  * shared prefix (names, brands, addresses), complementing the pure
  * edit-distance tier ([[org.apache.spark.sql.functions.levenshtein]] in
  * `Dedup.blockedEditDistance`). Spark ships no Jaro-family function, so
  * this is the standard published algorithm (Jaro 1989 / Winkler 1990)
  * with the RapidFuzz-lineage conventions that DuckDB's
  * `jaro_winkler_similarity` also follows — pinned by probe so the oracle
  * can be the independent DuckDB implementation:
  *
  *  - match window `max(⌊max(|a|,|b|)/2⌋ − 1, 0)`, greedy left-to-right
  *    first-unmatched pairing;
  *  - transpositions = ⌊(differing matched positions)/2⌋ (integer floor);
  *  - either side empty → 0.0 (including both-empty — the library
  *    convention, not the textbook 1.0);
  *  - Winkler boost `+ ℓ·0.1·(1 − jaro)` with prefix ℓ ≤ 4, applied only
  *    when jaro > 0.7.
  *
  * Char-based (UTF-16 units): exact for the ASCII/Latin-1 data this
  * engine scores; callers comparing astral-plane text should normalize
  * first. Codegen'd as a static call — stays inside whole-stage codegen
  * like [[Crc32Q]].
  */
object JaroWinkler {

  def compute(a: UTF8String, b: UTF8String): Double =
    computeStr(a.toString, b.toString)

  def computeStr(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (s1 == s2) return 1.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var diff = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) diff += 1
        k += 1
      }
      i += 1
    }
    val t = diff / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxP = math.min(4, math.min(l1, l2))
    while (l < maxP && s1.charAt(l) == s2.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  /** Column API: `jaroWinkler(a, b)` over strings, double in [0, 1]. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinklerExpression(
      GraftSqlBridge.expression(a.cast(StringType)),
      GraftSqlBridge.expression(b.cast(StringType))))
}

case class JaroWinklerExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (STRING, STRING), got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)
}
