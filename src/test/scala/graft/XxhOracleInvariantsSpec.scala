package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The XxhOracleSql twins are exact ONLY under two fixture invariants:
  * every hashed string is ASCII (so DuckDB `unicode(char)` equals the
  * UTF-8 byte Spark hashes) and ≤ 63 bytes (so at most one XXH64 stripe
  * — the generator unrolls exactly one). Pin both here so a fixture
  * drift fails a named test instead of surfacing as a mysterious oracle
  * mismatch. */
class XxhOracleInvariantsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def checkDir(dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tok = docs.select(explode(
      split(trim(lower(col("text"))), "\\s+")).as("w"))
    val r = tok.agg(
      max(length(col("w"))).as("max_tok"),
      max(expr("aggregate(split(w, ''), 0, (a, c) -> greatest(a, ascii(c)))"))
        .as("max_cp")).head()
    assert(r.getInt(0) <= 8, s"$dir: token over 8 bytes breaks the " +
      "shingle<=44-byte single-stripe bound")
    assert(r.getInt(1) <= 127, s"$dir: non-ASCII token — unicode(char) " +
      "no longer equals the UTF-8 byte")
    // fingerprint grams are 8 chars of raw text — raw text must be
    // ASCII. char_entropy rides the same pin: Spark split(text, "")
    // (Java-regex code points) and DuckDB split(text, '') only provably
    // segment identically on ASCII.
    val rawCp = docs.agg(max(expr(
      "aggregate(split(text, ''), 0, (a, c) -> greatest(a, ascii(c)))")))
      .head().getInt(0)
    assert(rawCp <= 127, s"$dir: non-ASCII document text")
    // and no document shorter than one full gram
    val minLen = docs.agg(min(length(col("text")))).head().getInt(0)
    assert(minLen >= 8, s"$dir: document shorter than an 8-gram")
    // bpe_apply's regex-fold oracle builds patterns from learned merge
    // symbols without escaping — only safe while tokens are [a-z0-9]
    val nonAlnum = tok.filter(not(col("w").rlike("^[a-z0-9]*$"))).count()
    assert(nonAlnum === 0,
      s"$dir: token with regex metacharacters — bpe_apply oracle unsafe")
  }

  test("sf0.001 and sf0.01 documents satisfy the xxh oracle invariants") {
    checkDir("/root/testdata/sf0.001")
    checkDir("/root/testdata/sf0.01")
  }
}
