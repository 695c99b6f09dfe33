package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.PngCodec

/** Contract of the PNG scanline codec: hand-built files (filtered bytes
  * computed by hand from RFC 2083 §6, one file per filter type 0-4)
  * decode to the exact hand-specified pixels; encode→decode round-trips
  * the closed-form formula for every filter; the BMP repackaging puts
  * decoded rows bottom-up with padding; malformed containers fail
  * loudly. */
class PngCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- hand-built 2x2 RGB image -------------------------------------
  // raw row 0: 10 20 30 | 40 50 60     raw row 1: 70 80 90 | 100 110 120
  private val raw = Array(10, 20, 30, 40, 50, 60,
    70, 80, 90, 100, 110, 120).map(_.toByte)

  /** Hand-computed filtered scanlines per type (stride 6, bpp 3). */
  private val filteredByType: Map[Int, Array[Int]] = Map(
    0 -> Array(10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120),
    // Sub: minus the byte 3 back in the same line
    1 -> Array(10, 20, 30, 30, 30, 30, 70, 80, 90, 30, 30, 30),
    // Up: minus the byte directly above (row 0 has no above)
    2 -> Array(10, 20, 30, 40, 50, 60, 60, 60, 60, 60, 60, 60),
    // Average: minus floor((left + up) / 2)
    3 -> Array(10, 20, 30, 35, 40, 45, 65, 70, 75, 45, 45, 45),
    // Paeth: minus the Paeth predictor of (left, up, upper-left)
    4 -> Array(10, 20, 30, 30, 30, 30, 60, 60, 60, 30, 30, 30))

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    val c = new java.util.zip.CRC32
    c.update(t); c.update(data)
    be32(data.length) ++ t ++ data ++ be32(c.getValue.toInt)
  }

  private def zlib(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(data); d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  private val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0D, 0x0A, 0x1A, 0x0A)
  private def ihdr(w: Int, h: Int) =
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))

  /** Assemble a 2x2 PNG whose scanlines carry `f`'s hand-computed
    * filtered bytes (split across `nIdat` IDAT chunks). */
  private def handBuilt(f: Int, nIdat: Int = 1): Array[Byte] = {
    val fb = filteredByType(f)
    val lines = Array(f.toByte) ++ fb.slice(0, 6).map(_.toByte) ++
      Array(f.toByte) ++ fb.slice(6, 12).map(_.toByte)
    val z = zlib(lines)
    val idats =
      if (nIdat == 1) chunk("IDAT", z)
      else {
        val cut = z.length / 2
        chunk("IDAT", z.slice(0, cut)) ++ chunk("IDAT", z.slice(cut, z.length))
      }
    sig ++ ihdr(2, 2) ++ idats ++ chunk("IEND", Array.emptyByteArray)
  }

  for (f <- 0 to 4)
    test(s"hand-built file, filter type $f: un-filtering recovers the " +
        "hand-specified pixels") {
      val (w, h, px) = PngCodec.decode(handBuilt(f))
      assert((w, h) === (2, 2))
      assert(px.toSeq === raw.toSeq)
    }

  test("IDAT split across two chunks decodes identically (chunk " +
      "concatenation, RFC 2083 §4.1.3)") {
    val (_, _, px) = PngCodec.decode(handBuilt(4, nIdat = 2))
    assert(px.toSeq === raw.toSeq)
  }

  test("encode -> decode round-trips the closed-form formula for every " +
      "filter type, on dims that exercise odd strides") {
    for (f <- 0 to 4; (w, h) <- Seq((11, 7), (8, 8), (1, 1), (23, 19))) {
      val png = PngCodec.encode(seed = 42L + f, w = w, h = h, filter = f)
      val (dw, dh, px) = PngCodec.decode(png)
      assert((dw, dh) === (w, h), s"f=$f")
      val expect = Array.tabulate(w * h * 3)(i =>
        (((42L + f) * 31L + i.toLong * 2654435761L) % 256L).toByte)
      assert(px.toSeq === expect.toSeq, s"filter $f ${w}x$h")
    }
  }

  test("toBmp: bottom-up rows, 4-byte padding, header dims — and the " +
      "column expressions agree with the local codec") {
    val png = PngCodec.encode(7L, 2, 2, 3)
    val bmp = PngCodec.toBmp(png)
    val (_, _, px) = PngCodec.decode(png)
    assert(bmp.length === 54 + 8 * 2) // stride 6 pads to 8
    assert((bmp(0), bmp(1)) === ('B'.toByte, 'M'.toByte))
    assert(bmp(18) === 2.toByte && bmp(22) === 2.toByte)
    // stored row 0 = image row 1 (bottom-up)
    assert(bmp.slice(54, 60).toSeq === px.slice(6, 12).toSeq)
    assert(bmp.slice(62, 68).toSeq === px.slice(0, 6).toSeq)
    assert(bmp.slice(60, 62).toSeq === Seq(0.toByte, 0.toByte)) // pad
    // the codegen'd column path produces the same bytes
    val viaCol = Seq((7L, 2, 2, 3)).toDF("seed", "w", "h", "f")
      .select(PngCodec.pngToBmp(PngCodec.synth(col("seed"), col("w"),
        col("h"), col("f"))).as("bmp"))
      .as[Array[Byte]].head()
    assert(viaCol.toSeq === bmp.toSeq)
  }

  test("malformed containers fail loudly: bad signature, unknown " +
      "filter type, truncated pixel data") {
    assert(intercept[IllegalArgumentException](
      PngCodec.decode("notapng".getBytes)).getMessage
      .contains("signature"))
    val badFilter = {
      val lines = Array(9.toByte) ++ raw.slice(0, 6) ++
        Array(9.toByte) ++ raw.slice(6, 12)
      sig ++ ihdr(2, 2) ++ chunk("IDAT", zlib(lines)) ++
        chunk("IEND", Array.emptyByteArray)
    }
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(badFilter)).getMessage.contains("filter type"))
    val short = {
      val lines = Array(0.toByte) ++ raw.slice(0, 6) // one of two rows
      sig ++ ihdr(2, 2) ++ chunk("IDAT", zlib(lines)) ++
        chunk("IEND", Array.emptyByteArray)
    }
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(short)).getMessage.contains("pixel data"))
    // a chunk whose declared length runs past the container (or is
    // negative) must fail as a named error, never raw IndexOutOfBounds
    val good = PngCodec.encode(7L, 2, 2, 0)
    val oversized = good.clone()
    oversized(8) = 0x7F.toByte // IHDR length -> ~Int.MaxValue
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(oversized)).getMessage.contains("beyond"))
    val negative = good.clone()
    negative(8) = 0x80.toByte // IHDR length sign bit
    assert(intercept[IllegalArgumentException](
      PngCodec.decode(negative)).getMessage.contains("beyond"))
  }
}
