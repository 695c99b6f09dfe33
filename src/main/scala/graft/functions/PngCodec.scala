package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Real PNG scanline codec over the engine's synthesized containers —
  * the piece that closes the multimodal tier's header-vs-pixel gap for
  * the one format whose compression machinery is already in-tree
  * ([[DeflateSize]] ships RFC-1951): [[PngCodec.encode]] builds a VALID
  * 8-bit RGB PNG (signature, IHDR, zlib-wrapped IDAT of filtered
  * scanlines, IEND, real CRC32s) whose pre-filter pixel bytes follow the
  * engine's closed-form byte formula `(seed·31 + i·2654435761) mod 256`
  * over the raw pixel index, and [[PngCodec.toBmp]] decodes it back —
  * inflate the IDAT, un-filter every scanline (all five PNG filter
  * types 0-4: None/Sub/Up/Average/Paeth, RFC 2083 §6), and repackage
  * the true pixels in the engine's 24-bpp bottom-up padded BMP layout
  * so [[graft.operators.Multimodal.imageAHash]]'s codegen'd sampler
  * hashes REAL decoded pixels.
  *
  * Correctness story (the bmpPixelContent oracle discipline): because
  * un-filtering exactly inverts filtering, the decoded bytes equal the
  * closed-form formula — so the DuckDB oracle recomputes the aHash from
  * the formula alone and never parses binary; a filter/unfilter bug on
  * ANY scanline surfaces as a hash diff. The filter type is an input,
  * so the battery exercises every type.
  *
  * Scale shape: a pure per-row projection (no state, no shuffle), cost
  * linear in decoded bytes; both expressions are native codegen'd
  * static calls inside whole-stage codegen (the [[DeflateSize]]
  * posture). Inflater/Deflater are allocated per call — they are not
  * thread-safe, and the µs setup is noise next to the byte work. */
object PngCodec {

  private val Bpp = 3 // 8-bit RGB (color type 2)

  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0D, 0x0A, 0x1A, 0x0A)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue.toInt
  }

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val t = tag.getBytes("US-ASCII")
    be32(data.length) ++ t ++ data ++ be32(crc32(t, data))
  }

  /** The closed-form pre-filter pixel byte at raw index `i` — the same
    * formula the BMP tier uses ([[graft.operators.Multimodal.bmpPixelContent]]),
    * over the UNPADDED top-down raw pixel stream. */
  private def formulaByte(seed: Long, i: Long): Int =
    (((seed * 31L + i * 2654435761L) % 256L).toInt + 256) % 256

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Build a valid PNG: w×h 8-bit RGB, every scanline filtered with
    * `filter` (0-4), pixels from the closed-form formula. */
  def encode(seed: Long, w: Int, h: Int, filter: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"png encode: bad dims ${w}x$h")
    require(filter >= 0 && filter <= 4, s"png filter out of range: $filter")
    val stride = w * Bpp
    val raw = new Array[Int](h * stride)
    var i = 0
    while (i < raw.length) { raw(i) = formulaByte(seed, i.toLong); i += 1 }
    val filtered = new Array[Byte](h * (stride + 1))
    var y = 0
    while (y < h) {
      filtered(y * (stride + 1)) = filter.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x)
        val left = if (x >= Bpp) raw(y * stride + x - Bpp) else 0
        val up = if (y > 0) raw((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= Bpp) raw((y - 1) * stride + x - Bpp)
          else 0
        val out = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        filtered(y * (stride + 1) + 1 + x) = (out & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater(6, false) // zlib wrapper (PNG spec)
    val idat = try {
      d.setInput(filtered); d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, color type 2 (RGB)
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode: walk chunks, inflate the IDAT stream, un-filter every
    * scanline (type byte per line — all five types handled), return
    * (w, h, raw top-down RGB). Fails loudly on a malformed container or
    * an unsupported layout (the engine's synthesized PNGs are always
    * 8-bit RGB). */
  def decode(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(png.length >= 8 && Signature.indices.forall(i =>
      png(i) == Signature(i)), "png decode: bad signature")
    def rbe32(off: Int): Int =
      ((png(off) & 0xFF) << 24) | ((png(off + 1) & 0xFF) << 16) |
        ((png(off + 2) & 0xFF) << 8) | (png(off + 3) & 0xFF)
    var off = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (off + 8 <= png.length) {
      val len = rbe32(off)
      // the length field is attacker-controlled bytes: a negative or
      // oversized value must fail as a named malformed-container error,
      // never a raw IndexOutOfBounds or a walk past valid chunks
      require(len >= 0 && off + 12 + len <= png.length,
        s"png decode: chunk at offset $off declares length $len " +
          s"beyond the ${png.length}-byte container")
      val tag = new String(png, off + 4, 4, "US-ASCII")
      tag match {
        case "IHDR" =>
          w = rbe32(off + 8); h = rbe32(off + 12)
          require(png(off + 16) == 8 && png(off + 17) == 2,
            "png decode: only 8-bit RGB supported")
        case "IDAT" => idat.write(png, off + 8, len)
        case _ => ()
      }
      off += 12 + len // len + tag + data + crc
    }
    require(w > 0 && h > 0, "png decode: no IHDR")
    val stride = w * Bpp
    val inf = new java.util.zip.Inflater(false)
    val filtered = new Array[Byte](h * (stride + 1))
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < filtered.length && !inf.finished()) {
        val n = inf.inflate(filtered, got, filtered.length - got)
        require(n > 0 || inf.finished(), "png decode: truncated IDAT")
        got += n
      }
      require(got == filtered.length, "png decode: short pixel data")
    } finally inf.end()
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (stride + 1)) & 0xFF
      var x = 0
      while (x < stride) {
        val in = filtered(y * (stride + 1) + 1 + x) & 0xFF
        val left = if (x >= Bpp) raw(y * stride + x - Bpp) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xFF else 0
        val ul = if (y > 0 && x >= Bpp)
          raw((y - 1) * stride + x - Bpp) & 0xFF else 0
        val cur = ft match {
          case 0 => in
          case 1 => in + left
          case 2 => in + up
          case 3 => in + ((left + up) >> 1)
          case 4 => in + paeth(left, up, ul)
          case other =>
            throw new IllegalArgumentException(
              s"png decode: unknown filter type $other on line $y")
        }
        raw(y * stride + x) = (cur & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    (w, h, raw)
  }

  /** Decode a PNG and repackage the true pixels as the engine's 24-bpp
    * BMP layout (54-byte header, bottom-up rows, 4-byte row padding) —
    * PNG image row `py` lands at stored BMP row `h-1-py`, triplet bytes
    * copied in stream order, so downstream samplers
    * ([[graft.operators.Multimodal.imageAHash]]) read REAL decoded
    * pixels through the exact layout they already handle. */
  def toBmp(png: Array[Byte]): Array[Byte] = {
    val (w, h, raw) = decode(png)
    val stride = w * Bpp
    val rs = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + rs * h)
    // header: the bmpContent layout (BM, file size, data offset 54,
    // BITMAPINFOHEADER with 24 bpp)
    out(0) = 'B'; out(1) = 'M'
    def le32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    le32(2, 54 + rs * h); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, h)
    out(26) = 1; out(28) = 24
    var py = 0
    while (py < h) {
      System.arraycopy(raw, py * stride, out,
        54 + (h - 1 - py) * rs, stride)
      py += 1
    }
    out
  }

  /** Column API: `pngSynth(seed, w, h, filter)` → BINARY valid PNG. */
  def synth(seed: Column, w: Column, h: Column, filter: Column): Column =
    GraftSqlBridge.column(PngSynthExpression(
      GraftSqlBridge.expression(seed.cast("long")),
      GraftSqlBridge.expression(w.cast("int")),
      GraftSqlBridge.expression(h.cast("int")),
      GraftSqlBridge.expression(filter.cast("int"))))

  /** Column API: `pngToBmp(content)` → BINARY BMP of decoded pixels. */
  def pngToBmp(c: Column): Column =
    GraftSqlBridge.column(PngToBmpExpression(GraftSqlBridge.expression(c)))
}

case class PngSynthExpression(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (LongType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"png_synth requires (LONG, INT, INT, INT), got $other")
    }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_synth"

  override def nullSafeEval(seed: Any, w: Any, h: Any, f: Any): Any =
    PngCodec.encode(seed.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], f.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w, h, f) =>
      s"graft.functions.PngCodec.encode($s, $w, $h, $f)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PngSynthExpression =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

case class PngToBmpExpression(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"png_to_bmp requires BINARY input, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "png_to_bmp"

  override def nullSafeEval(input: Any): Any =
    PngCodec.toBmp(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PngCodec.toBmp($c)")

  override protected def withNewChildInternal(
      newChild: Expression): PngToBmpExpression = copy(child = newChild)
}
