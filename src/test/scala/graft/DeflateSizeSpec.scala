package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.DeflateSize

/** Semantics pins for the compression-ratio quality signal (the
  * `compress_ratio` query is rows-only — deflate byte counts vary with
  * the JVM's zlib build, so the spec asserts the properties curation
  * relies on, not byte constants). */
class DeflateSizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
      out.toByteArray
    } finally inf.end()
  }

  private def deflateBytes(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  test("size matches an actual RFC 1951 stream that round-trips") {
    val s = "the quick brown fox jumps over the lazy dog " * 10
    val stream = deflateBytes(s)
    assert(DeflateSize.computeUtf8(s) === stream.length.toLong)
    assert(new String(inflate(stream), "UTF-8") === s)
  }

  test("signal ordering: repetitive < prose < random, per byte") {
    val n = 4096
    val repetitive = "spam ham " * (n / 9)
    val prose = Iterator.continually(Seq("alpha", "beta", "gamma", "delta",
        "epsilon", "zeta", "eta", "theta", "iota", "kappa"))
      .flatten.zipWithIndex
      .map { case (w, i) => if (i % 7 == 0) w.capitalize + "." else w }
      .take(n / 6).mkString(" ")
    val rnd = new scala.util.Random(42)
    val random = rnd.alphanumeric.take(n).mkString
    def permille(s: String): Long =
      DeflateSize.computeUtf8(s) * 1000 / s.getBytes("UTF-8").length
    assert(permille(repetitive) < permille(prose))
    assert(permille(prose) < permille(random))
    assert(permille(repetitive) < 100)
    assert(permille(random) > 600)
  }

  test("catalyst expression == direct compute, codegen path, null-safe") {
    import spark.implicits._
    val rows = Seq("", "abc", "x" * 1000, "mixed Utf8 naïve δοκιμή")
    val df = rows.toDF("s")
    val got = df.select(DeflateSize(col("s")).as("n"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === rows.map(DeflateSize.computeUtf8))
    val withNull = df.select(
      DeflateSize(when(col("s") === "abc", null).otherwise(col("s"))).as("n"))
    assert(withNull.collect().count(_.isNullAt(0)) === 1)
  }

  test("empty input deflates to the fixed 2-byte empty block") {
    // RFC 1951: an empty stream is one final stored/fixed block — zlib
    // emits exactly 2 bytes for it at every level; a drifted zlib that
    // broke this would also break the ratio floor for tiny docs.
    assert(DeflateSize.computeUtf8("") === 2L)
  }
}
