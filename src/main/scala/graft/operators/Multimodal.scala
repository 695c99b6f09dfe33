package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure-JVM container-header probes for the formats whose metadata is
  * parseable without a codec library: BMP (pixel dimensions from the DIB
  * header), RIFF/WAVE (PCM frame count from the fmt/data chunks), PNG
  * (dimensions from the mandatory-first IHDR chunk — no inflate needed),
  * GIF (logical screen descriptor), and JPEG (marker walk to the first
  * start-of-frame segment). This is a real decoder for real bytes —
  * byte-layout parsing per the public file-format specs — and it runs
  * exactly where the batch shape wants it: per row inside a
  * `mapPartitions` batch, no Spark types involved. PIXEL decode of
  * compressed payloads (JPEG entropy data, PNG IDAT, MP4…) still needs
  * codec libraries this environment doesn't ship; bytes no probe
  * recognizes fall through to the deterministic stub in
  * [[Multimodal.decodeAssets]].
  */
object HeaderProbe {

  /** Probed metadata: raster dims (0 for audio) + frame count (PCM frames
    * for audio, 1 for still images). */
  final case class Probe(width: Int, height: Int, nFrames: Int)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == t.charAt(i).toByte)

  /** BMP: `BM` magic, DIB header size at offset 14 selects the layout —
    * BITMAPINFOHEADER-family (≥40 bytes: int32 dims at 18/22, height
    * negative for top-down rows) or the legacy BITMAPCOREHEADER (12 bytes:
    * uint16 dims at 18/20). */
  def bmp(b: Array[Byte]): Option[Probe] = {
    if (b.length < 26 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val dibSize = le32(b, 14)
    if (dibSize >= 40 && b.length >= 14 + 40) {
      val w = le32(b, 18)
      val h = le32(b, 22)
      if (w > 0 && h != 0 && h != Int.MinValue) Some(Probe(w, math.abs(h), 1))
      else None
    } else if (dibSize == 12) {
      val w = le16(b, 18)
      val h = le16(b, 20)
      if (w > 0 && h > 0) Some(Probe(w, h, 1)) else None
    } else None
  }

  /** RIFF/WAVE: chunk-walk for `fmt ` (block align = bytes per sample
    * frame) and `data` (payload byte length); frames = dataLen/blockAlign.
    * The data chunk's DECLARED size is authoritative — RIFF permits it to
    * be the last chunk with the payload streamed after the header, so the
    * walk never requires the payload bytes themselves to be present. */
  def wav(b: Array[Byte]): Option[Probe] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var off = 12
    var blockAlign = 0
    var dataLen = -1L
    while (off + 8 <= b.length && (blockAlign == 0 || dataLen < 0)) {
      val size = le32(b, off + 4).toLong & 0xffffffffL
      if (tag(b, off, "fmt ") && off + 8 + 16 <= b.length)
        blockAlign = le16(b, off + 8 + 12)
      else if (tag(b, off, "data"))
        dataLen = size
      // chunks are word-aligned; a size that walks past the buffer ends
      // the scan naturally via the loop guard
      off += 8 + (size + (size & 1L)).min(Int.MaxValue.toLong).toInt
      if (off < 0) return None // int overflow on a hostile size field
    }
    if (blockAlign > 0 && dataLen >= 0)
      Some(Probe(0, 0, (dataLen / blockAlign).min(Int.MaxValue.toLong).toInt))
    else None
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private val pngSig =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk MUST come first (PNG spec
    * §11.2.2) — big-endian int32 width/height at offsets 16/20. Dimensions
    * live entirely in the header; no inflate needed. */
  def png(b: Array[Byte]): Option[Probe] = {
    if (b.length < 24 || !pngSig.indices.forall(i => b(i) == pngSig(i)))
      return None
    if (!tag(b, 12, "IHDR")) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w > 0 && h > 0) Some(Probe(w, h, 1)) else None
  }

  /** GIF87a/89a: 6-byte version magic, then the logical screen descriptor —
    * little-endian uint16 width/height at offsets 6/8. */
  def gif(b: Array[Byte]): Option[Probe] = {
    if (b.length < 10 || b(0) != 'G'.toByte || b(1) != 'I'.toByte ||
      b(2) != 'F'.toByte || b(3) != '8'.toByte ||
      (b(4) != '7'.toByte && b(4) != '9'.toByte) || b(5) != 'a'.toByte)
      return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w > 0 && h > 0) Some(Probe(w, h, 1)) else None
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** JPEG: SOI then a marker walk — each segment is `FF marker len(BE16,
    * includes itself) payload`; standalone markers (TEM, RSTn, SOI) carry
    * no length, and 0xFF fill bytes before a marker are padding (JPEG
    * spec B.1.1.2). Dimensions live in the first start-of-frame segment
    * (SOF0/1/2/…: precision byte, then BE16 height, BE16 width) — C4/C8/CC
    * sit in the SOF code range but are DHT/JPG/DAC, not frames. A SOS or
    * EOI before any SOF means no parseable dimensions: give up rather
    * than guess, like any honest sniffer. */
  def jpeg(b: Array[Byte]): Option[Probe] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var off = 2
    while (off + 1 < b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      val m = b(off + 1) & 0xff
      if (m == 0xff) off += 1 // fill byte, resync on the next 0xff
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) off += 2
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS, no SOF seen
      else {
        if (off + 4 > b.length) return None
        val len = be16(b, off + 2)
        if (len < 2) return None
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (off + 9 > b.length) return None
          val h = be16(b, off + 5)
          val w = be16(b, off + 7)
          return if (w > 0 && h > 0) Some(Probe(w, h, 1)) else None
        }
        off += 2 + len
      }
    }
    None
  }

  /** First matching container probe, by magic bytes. */
  def probe(b: Array[Byte]): Option[Probe] =
    bmp(b).orElse(wav(b)).orElse(png(b)).orElse(gif(b)).orElse(jpeg(b))
}

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark side — schema, partitioning, batch shape, typed mapPartitions —
  * is real and tested. Decoding: BMP, WAV, PNG and GIF headers are REALLY
  * parsed ([[HeaderProbe]] — dimensions and PCM frame counts from the
  * container bytes); pixel payloads of compressed formats (no codec
  * libraries in this environment) fall through to a clearly-marked
  * deterministic stub. Swapping in a full codec changes only the per-row
  * function body, not the pipeline shape.
  */
object Multimodal {

  /** Canonical asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("byte_len", LongType))))))

  case class DecodedMeta(asset_id: Long, modality: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int)

  /** Wrap any table with a text/blob column as an asset table (binary
    * payload + metadata) — the ingestion shape a real media pipeline has. */
  def toAssets(df: DataFrame, idCol: String, payloadCol: String,
      sourceCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(modality).as("modality"),
      encode(col(payloadCol).cast("string"), "UTF-8").as("content"),
      struct(col(sourceCol).cast("string").as("source"),
        length(encode(col(payloadCol).cast("string"), "UTF-8")).cast("long")
          .as("byte_len")).as("meta"))

  /** Decode stage: container headers are probed for REAL on every row
    * ([[HeaderProbe]] — BMP dimensions, WAV PCM frame counts, straight
    * from the byte layout; content sniffing takes precedence over the
    * declared modality, as any honest decoder must). Bytes no probe
    * recognizes — compressed formats need codec libraries this environment
    * doesn't ship — fall through to the deterministic STUB below, clearly
    * marked. Per-partition batch shape retained so a full codec's init
    * amortizes across the batch (the same shape a Pandas-UDF/`mapInPandas`
    * implementation uses in PySpark). */
  def decodeAssets(assets: DataFrame): Dataset[DecodedMeta] = {
    val enc = Encoders.product[DecodedMeta]
    assets.select("asset_id", "modality", "content")
      .mapPartitions { rows: Iterator[Row] =>
        // per-partition codec init for heavier decoders would go here
        rows.map { r =>
          val id = r.getLong(0)
          val mod = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.empty)
          val n = bytes.length
          HeaderProbe.probe(bytes) match {
            case Some(p) =>
              DecodedMeta(id, mod, n.toLong, p.width, p.height, p.nFrames)
            case None =>
              // STUB: fake decode for unprobeable content — deterministic
              // in the bytes
              val w = 16 + (n % 64)
              val h = 16 + ((n / 7) % 64)
              val frames = if (mod == "video") 1 + (n % 30) else 1
              DecodedMeta(id, mod, n.toLong, w, h, frames)
          }
        }
      }(enc)
  }

  /** Frame sampling: one row per sampled frame index (stride sampling) —
    * pure Spark on the decoded metadata, explode of a sequence; in a real
    * pipeline each row would then decode its single frame. */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("asset_id"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .as("frame_idx"))

  /** Resize planning: aspect-preserving fit of each decoded image into a
    * `maxSide`×`maxSide` box, never upscaling — target dimensions and the
    * applied scale (permille) per asset. Pure column arithmetic over the
    * decoded metadata: the pixel-level resample belongs in the same
    * per-partition codec batch as the decode, while THIS — the planning
    * pass that sizes buffers, shards work and prices the job — is the
    * distributed part, and costs one fused projection.
    * round(x/scale) arithmetic is done in integer micros to stay exact
    * across engines (the oracle recomputes it). */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    // scale_permille = min(1000, floor(maxSide*1000/longSide))
    val scale = least(lit(1000L),
      floor(lit(maxSide.toLong * 1000L) / longSide).cast("long"))
    decoded.select(col("asset_id"),
      scale.as("scale_permille"),
      floor(col("width") * scale / lit(1000L)).cast("long").as("out_w"),
      floor(col("height") * scale / lit(1000L)).cast("long").as("out_h"))
  }

  /** Patch-grid tiling: one row per (tile_x, tile_y) cell of each decoded
    * image — the ViT-style patching shape. Pure Spark on decoded metadata
    * (two sequence explodes = the cross of the per-axis tile counts); in a
    * real pipeline each row would then crop/encode its single patch. */
  def patchGrid(decoded: DataFrame, tile: Int): DataFrame =
    decoded
      .select(col("asset_id"),
        ceil(col("width") / lit(tile.toDouble)).cast("int").as("nx"),
        ceil(col("height") / lit(tile.toDouble)).cast("int").as("ny"))
      .select(col("asset_id"), col("ny"),
        explode(sequence(lit(0), col("nx") - 1)).as("px"))
      .select(col("asset_id"), col("px"),
        explode(sequence(lit(0), col("ny") - 1)).as("py"))

  /** Hex of little-endian byte `i` of a non-negative int column. */
  private def byteHex(c: Column, i: Int): Column =
    lpad(hex(shiftright(c, 8 * i).bitwiseAND(lit(255)).cast("long")), 2, "0")

  private def le32Hex(c: Column): Column =
    concat(byteHex(c, 0), byteHex(c, 1), byteHex(c, 2), byteHex(c, 3))

  /** Synthesize a canonical 44-byte PCM WAV header as a binary column
    * (RIFF + fmt[1ch=2,44100Hz,blockAlign=4,16bit] + data with the given
    * payload byte length — payload itself omitted; RIFF permits the data
    * chunk to be declared-then-streamed and [[HeaderProbe.wav]] honors
    * that). Pure codegen'd expressions (hex/concat/unhex), so container
    * synthesis fuses into the scan stage — this is how the engine can
    * round-trip its own decode path at any scale without stored media. */
  def wavContent(dataLen: Column): Column =
    unhex(concat(
      lit("52494646"), le32Hex(dataLen + lit(36)),
      lit("57415645666D7420100000000100020044AC000010B102000400100064617461"),
      le32Hex(dataLen)))

  /** [[wavContent]] plus an ACTUAL PCM payload: `nSamples` s16le samples
    * generated by the deterministic integer mix
    * `raw(i) = (seed·31 + i·2654435761) mod 65536` (signed value =
    * raw − 65536 when raw ≥ 2¹⁵). Still pure codegen'd expressions — the
    * payload hex is one `transform` lambda over `sequence`, so synthesis
    * fuses into the scan. This is the round-trip input for
    * [[pcmWindowEnergy]]: the DECODER reads bytes, only the generator
    * knows the formula, and an oracle can regenerate the expected energy
    * from the same closed form without ever parsing binary. */
  def wavPcmContent(seed: Column, nSamples: Column): Column = {
    val payload = array_join(
      transform(sequence(lit(0L), nSamples - 1), i =>
        le16Hex((seed * 31 + i * lit(2654435761L)) % 65536)), "")
    concat(wavContent(nSamples * 2), unhex(payload))
  }

  /** Windowed PCM energy over a canonical-layout WAV (44-byte header,
    * s16le data chunk — the layout [[wavContent]] emits; the general
    * chunk-walk lives in [[HeaderProbe.wav]] and a spec cross-checks the
    * two agree on the data length): per `window`-sample frame, the sample
    * count and Σ s² — the VAD / silence-trim / loudness feature pass.
    * REAL byte-level decode: the data length is read from the LE32 chunk
    * size, each sample from its two payload bytes (hex→int, sign-extend)
    * — all codegen'd expressions (substring/conv), no UDF, so decode +
    * explode + aggregate is one whole-stage pipeline into a partial
    * aggregate on (asset, frame). Rows carry only (id, 2 longs) into the
    * single shuffle. */
  def pcmWindowEnergy(assets: DataFrame, idCol: String, contentCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window=$window")
    def byteAt(pos: String): String =
      s"CAST(conv(hex(substring($contentCol, $pos, 1)), 16, 10) AS BIGINT)"
    val dataLen = s"(${byteAt("41")} + 256*${byteAt("42")} + " +
      s"65536*${byteAt("43")} + 16777216*${byteAt("44")})"
    assets
      .withColumn("__n", expr(s"$dataLen DIV 2"))
      .select(col(idCol), col(contentCol),
        explode(expr("sequence(0L, __n - 1)")).as("__i"))
      .withColumn("__raw", expr(
        s"${byteAt("CAST(45 + 2*__i AS INT)")} + " +
          s"256*${byteAt("CAST(46 + 2*__i AS INT)")}"))
      .withColumn("__s",
        expr("CASE WHEN __raw >= 32768 THEN __raw - 65536 ELSE __raw END"))
      .groupBy(col(idCol), expr(s"__i DIV $window").as("frame"))
      .agg(count(lit(1)).as("n_samples"),
        sum(expr("__s * __s")).as("energy"))
  }

  /** Synthesize a 54-byte BMP (file header + BITMAPINFOHEADER, no pixel
    * array) with the given dimensions, as a binary column. */
  def bmpContent(w: Column, h: Column): Column =
    unhex(concat(
      lit("424D"), le32Hex(lit(54)), lit("00000000"), le32Hex(lit(54)),
      lit("28000000"), le32Hex(w), le32Hex(h), lit("01001800"),
      lit("00" * 24)))

  /** [[bmpContent]] plus an ACTUAL 24-bpp pixel array: rows bottom-up
    * with 4-byte alignment padding (the real BMP layout), each payload
    * byte generated by `(seed·31 + i·2654435761) mod 256` over its index
    * in the pixel data (pad bytes zero). Same codegen'd-synthesis
    * contract as [[wavPcmContent]]: one `transform` lambda fused into the
    * scan, and [[imageAHash]] gets a closed-form oracle that never parses
    * binary. */
  def bmpPixelContent(seed: Column, w: Column, h: Column,
      perturb: Column = lit(0L)): Column = {
    val rs = ((w * 3 + 3) / 4).cast("long") * 4
    // perturb shifts every 97th payload byte by its value (mod 256):
    // the controlled "small visual edit" that gives the Hamming tier
    // planted near-dups with a closed-form oracle
    val payload = array_join(
      transform(sequence(lit(0L), rs * h - 1), i =>
        when(i % rs >= w * 3, lit("00"))
          .otherwise(lpad(hex(((seed * 31 + i * lit(2654435761L)) % 256
            + perturb * when(i % 97 === 0, 1L).otherwise(0L)) % 256),
            2, "0"))), "")
    concat(
      unhex(concat(
        lit("424D"), le32Hex(lit(54) + rs * h), lit("00000000"),
        le32Hex(lit(54)), lit("28000000"), le32Hex(w), le32Hex(h),
        lit("01001800"), lit("00" * 24))),
      unhex(payload))
  }

  /** Point-sampled 8×8 average-hash (aHash) over a 24-bpp BMP — the
    * perceptual near-dup fingerprint for images, with decode cost
    * INDEPENDENT of image size: dimensions come from the real header
    * bytes (LE32 at offsets 18/22), then exactly 64 pixels are sampled
    * (cell centers of the 8×8 grid), integer BT.601 luma per sample, one
    * bit per cell by the integer cross-multiplied mean test
    * `luma·64 > Σluma`. Returns (id, width, height, ahash_hex) with the
    * hash as 16 hex chars (row bytes top-to-bottom) — no 64-bit sign
    * games.
    *
    * All decode is codegen'd expressions (substring/conv — no UDF): the
    * 64-cell explode fans each asset to 64 rows of a few longs, the mean
    * rides a 64-row window keyed on the asset, and two tiny aggregates
    * rebuild the hash. Bottom-up row order and row padding live in the
    * offset arithmetic — the bytes are the real BMP layout. */
  def imageAHash(assets: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def byteAt(pos: String): String =
      s"CAST(conv(hex(substring($contentCol, $pos, 1)), 16, 10) AS BIGINT)"
    def le32(pos: Int): String =
      s"(${byteAt(pos.toString)} + 256*${byteAt((pos + 1).toString)} + " +
        s"65536*${byteAt((pos + 2).toString)} + " +
        s"16777216*${byteAt((pos + 3).toString)})"
    val cells = assets
      .withColumn("__w", expr(le32(19))) // 1-based substring: offset 18
      .withColumn("__h", expr(le32(23)))
      .withColumn("__rs", expr("((3 * __w + 3) DIV 4) * 4"))
      .select(col(idCol), col(contentCol), col("__w"), col("__h"),
        col("__rs"), explode(expr("sequence(0L, 63L)")).as("__cell"))
      .withColumn("__cx", expr("__cell % 8"))
      .withColumn("__cy", expr("__cell DIV 8"))
      .withColumn("__px", expr("((2*__cx + 1) * __w) DIV 16"))
      .withColumn("__py", expr("((2*__cy + 1) * __h) DIV 16"))
      // bottom-up storage: image row __py lives at stored row h-1-__py
      .withColumn("__off",
        expr("55 + (__h - 1 - __py) * __rs + 3 * __px"))
      .withColumn("__luma", expr(
        s"(299*${byteAt("CAST(__off + 2 AS INT)")} + " +
          s"587*${byteAt("CAST(__off + 1 AS INT)")} + " +
          s"114*${byteAt("CAST(__off AS INT)")}) DIV 1000"))
    val w64 = Window.partitionBy(col(idCol))
    val bits = cells
      .withColumn("__sum", sum(col("__luma")).over(w64))
      .withColumn("__bit",
        when(col("__luma") * 64 > col("__sum"), 1L).otherwise(0L))
    bits.groupBy(col(idCol), col("__w"), col("__h"), col("__cy"))
      .agg(sum(expr("__bit * shiftleft(1L, CAST(__cx AS INT))")).as("__rb"))
      .groupBy(col(idCol), col("__w").as("width"), col("__h").as("height"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__cy"), col("__rb")))),
        x => lpad(hex(x.getField("__rb")), 2, "0")), "").as("ahash_hex"))
  }

  /** Hex of big-endian int32 (network order, PNG chunk fields). */
  private def be32Hex(c: Column): Column =
    concat(byteHex(c, 3), byteHex(c, 2), byteHex(c, 1), byteHex(c, 0))

  private def le16Hex(c: Column): Column =
    concat(byteHex(c, 0), byteHex(c, 1))

  /** Synthesize a PNG signature + IHDR chunk (33 bytes: 8-bit RGBA, CRC
    * left zero — [[HeaderProbe.png]] reads the byte layout, it does not
    * verify CRCs, exactly like real fast-path dimension sniffers). */
  def pngContent(w: Column, h: Column): Column =
    unhex(concat(
      lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      be32Hex(w), be32Hex(h), lit("0806000000"), lit("00000000")))

  /** Synthesize a GIF89a header + logical screen descriptor (13 bytes). */
  def gifContent(w: Column, h: Column): Column =
    unhex(concat(
      lit("474946383961"), le16Hex(w), le16Hex(h), lit("000000")))

  private def be16Hex(c: Column): Column =
    concat(byteHex(c, 1), byteHex(c, 0))

  /** Synthesize a JPEG prefix (39 bytes): SOI, a JFIF APP0 segment, and a
    * baseline SOF0 for a 3-component (YCbCr 4:4:4) frame with the given
    * dimensions — everything [[HeaderProbe.jpeg]]'s marker walk needs,
    * with a real APP0 in front so the walk actually walks. */
  def jpegContent(w: Column, h: Column): Column =
    unhex(concat(
      lit("FFD8"),
      lit("FFE000104A46494600010100000100010000"),
      lit("FFC0001108"), be16Hex(h), be16Hex(w),
      lit("03011100021101031101")))

  /** Banded Hamming near-dup pairs over 64-bit perceptual hashes (as the
    * 16-hex-char form [[imageAHash]] emits): pigeonhole blocking — a pair
    * within Hamming distance d < 8 must agree EXACTLY on at least one of
    * the eight 8-bit bands (pigeonhole: d mismatched bits can dirty at
    * most d bands), so candidates come from eight band equi-joins
    * (union, dedup), then the exact distance verifies via XOR popcount on
    * the two 32-bit halves (no 64-bit sign games). The image-tier twin of
    * MinHash banding: never all-pairs, candidate volume = Σ|band
    * bucket|²/2. */
  def ahashHammingPairs(hashes: DataFrame, idCol: String, hexCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 7,
      s"maxDist=$maxDist: 8 bands are lossless only for d ≤ 7")
    // Materialize the (id, halves) table ONCE — it feeds both sides of the
    // band join, and without this the whole upstream pipeline (decode +
    // hash, the expensive part) replays per plan reference. 26 bytes/image.
    val v = hashes.select(col(idCol).as("id"),
        expr(s"CAST(conv(substring($hexCol, 1, 8), 16, 10) AS BIGINT)").as("hi"),
        expr(s"CAST(conv(substring($hexCol, 9, 8), 16, 10) AS BIGINT)").as("lo"),
        array((0 until 8).map(b =>
          expr(s"substring($hexCol, ${b * 2 + 1}, 2)")): _*).as("__bands"))
      .localCheckpoint()
    // Inverted-index form: ONE equi-join on the (band#, band-value) pair —
    // not eight separate self-joins — and the exact Hamming test runs
    // INSIDE the join before anything is materialized, so only true
    // near-dups (not the ~|bucket|²/2 candidate flood, measured 1.5M pairs
    // vs 288 survivors at sf0.1) reach the final pair-dedup shuffle.
    val inv = v.select(col("id"), col("hi"), col("lo"),
      posexplode(col("__bands")).as(Seq("bno", "bv")))
    inv.as("x").join(inv.as("y"),
        col("x.bno") === col("y.bno") && col("x.bv") === col("y.bv") &&
        col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"), expr(
        "CAST(bit_count(x.hi ^ y.hi) + bit_count(x.lo ^ y.lo) AS BIGINT)")
        .as("hamming"))
      .filter(col("hamming") <= maxDist)
      .dropDuplicates("a", "b")
  }

  /** Scene-change detection over per-frame perceptual hashes — the video
    * shot-segmentation pass: consecutive frames whose aHash Hamming
    * distance exceeds `cutHamming` mark a cut; output per asset is the
    * frame count, scene count (cuts + 1) and the strongest cut. One
    * window pass per asset ordered by frame index (frame counts per
    * asset are bounded — the sampled-frames contract of
    * [[sampleFrames]]), XOR-popcount on the packed 32-bit hash halves —
    * no UDF, no pairwise join (consecutive frames only, unlike the
    * all-pairs [[ahashHammingPairs]] tier). */
  def sceneChanges(hashes: DataFrame, assetCol: String, frameCol: String,
      hexCol: String, cutHamming: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = hashes.select(col(assetCol).as("aid"), col(frameCol).as("f"),
      expr(s"CAST(conv(substring($hexCol, 1, 8), 16, 10) AS BIGINT)")
        .as("hi"),
      expr(s"CAST(conv(substring($hexCol, 9, 8), 16, 10) AS BIGINT)")
        .as("lo"))
    val w = Window.partitionBy("aid").orderBy("f")
    v.withColumn("__phi", lag(col("hi"), 1).over(w))
      .withColumn("__plo", lag(col("lo"), 1).over(w))
      .withColumn("__ham", expr(
        "CAST(bit_count(hi ^ __phi) + bit_count(lo ^ __plo) AS BIGINT)"))
      .groupBy(col("aid").as(assetCol))
      .agg(count(lit(1)).as("n_frames"),
        (sum(when(col("__ham") > cutHamming, 1L).otherwise(0L)) + lit(1L))
          .as("n_scenes"),
        max(coalesce(col("__ham"), lit(0L))).as("max_cut_hamming"))
  }

  /** Silence-run segmentation over [[pcmWindowEnergy]] frames — the VAD /
    * silence-trim report: frames whose MEAN energy per sample falls below
    * `meanThreshold` (cleared-denominator compare: Σs² < thr·n, all
    * BIGINT) form runs; output per asset = frame count, silent-run count,
    * total silent frames, longest run. Runs via the rank-difference
    * island identity (the [[EventAnalytics.streakCensus]] shape) — one
    * window pass over the per-asset frame grid, counts collapse before
    * the final aggregate. */
  def silenceRuns(energies: DataFrame, idCol: String, frameCol: String,
      energyCol: String, nSamplesCol: String,
      meanThreshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col(frameCol))
    val runs = energies
      .filter(col(energyCol) < lit(meanThreshold) * col(nSamplesCol))
      .withColumn("__isl", col(frameCol) - row_number().over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_runs"), sum(col("__len")).as("n_silent"),
        max(col("__len")).as("max_run"))
    energies.groupBy(col(idCol)).agg(count(lit(1)).as("n_frames"))
      .join(runs, Seq(idCol), "left")
      .select(col(idCol), col("n_frames"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("n_silent"), lit(0L)).as("n_silent"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** ===== STUB feature extraction =====
    * Deterministic fake feature vector from content bytes (real impl: model
    * inference per partition-batch). Demonstrates the wide-row (id, vec)
    * output shape feeding [[Similarity]]. */
  def extractFeatures(assets: DataFrame, dim: Int = 8): DataFrame =
    assets.select(col("asset_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("content"), i), lit(2000L)).cast("double")
          - lit(1000.0)) / lit(1000.0)).as("vec"))

  /** Content-defined chunking (Muthitacharoen et al. 2001's LBFS
    * scheme with a FastCDC-style gear window) — the binary-blob dedup
    * primitive a dataset lake runs before storing image/audio/video
    * payloads: a rolling hash over the last `window` bytes places a
    * chunk boundary wherever its low `maskBits` bits are zero, so
    * boundaries move WITH content (insert a byte and every later chunk
    * re-aligns — the shift-resistance a fixed-grid chunker lacks,
    * pinned in MultimodalSpec).
    *
    * Fixed-point algebra, exactly replayable: gear
    * `g(b) = (b+1)·2654435761 mod 2³²`, rolling
    * `h_k = Σ_{j<window} g(b_{k−j})·2^j` (a pure function of the last
    * `window` bytes — shift-out for free), boundary after byte k iff
    * `h_k mod 2^maskBits = 0`; each chunk's signature is the
    * chunk-RELATIVE positional sum `Σ (b+7)·((rel+13)³ mod P) mod P`
    * (P = 10⁹+7, commutative so the unordered aggregate is exact, and
    * relative so equal content at different offsets — the dedup case —
    * signs equal).
    *
    * Shape: one posexplode of the byte column → gear projection →
    * ONE id-ordered window pass (window−1 lag columns for h, a lagged
    * boundary cumsum for the chunk offset — the lead-column discipline
    * of dup_spans/winnowing, no per-byte lambda anywhere) → one
    * (id, off) hash aggregate. Expected chunk size 2^maskBits bytes;
    * bytes shuffle once as (id, k, b) longs. Returns
    * (id, chunk_idx, off, len, chunk_sig); `bytesCol` is array<long>
    * of byte values, offsets 0-based. */
  def cdcChunks(df: DataFrame, idCol: String, bytesCol: String,
      window: Int = 8, maskBits: Int = 8): DataFrame =
    cdcChunkRows(
      df.select(col(idCol).as("id"),
          posexplode(col(bytesCol)).as(Seq("k", "b")))
        .select(col("id"), col("k").cast("long").as("k"), col("b")),
      window, maskBits)

  /** [[cdcChunks]] on pre-exploded byte ROWS (id, k, b) — the form to
    * use when bytes are SYNTHESIZED from a formula: building an array
    * column first makes the Generate's pushed-down size/null guard
    * re-evaluate the whole interpreted `transform` lambda per input row
    * (FilterExec does no subexpression elimination — the curate_docs
    * lesson; measured 3× the 4096-element synthesis per doc, 14.5 s at
    * sf0.1 vs 2.5 s for this row form, where the per-byte formula is a
    * codegen'd projection after a sequence explode). */
  def cdcChunkRows(rows: DataFrame, window: Int = 8,
      maskBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 2 && window <= 32, s"window=$window out of range")
    require(maskBits >= 4 && maskBits <= 20, s"maskBits=$maskBits")
    val P = 1000000007L
    val mask = (1L << maskBits) - 1L
    val b = rows.select(col("id"), col("k"), col("b"),
      pmod((col("b") + 1L) * lit(2654435761L), lit(4294967296L))
        .as("g"))
    val byDoc = Window.partitionBy("id").orderBy("k")
    val h = (0 until window).map { j =>
      val gj = if (j == 0) col("g") else lag(col("g"), j).over(byDoc)
      gj * lit(1L << j)
    }.reduce(_ + _)
    // boundary AFTER byte k; incomplete leading windows never cut
    val bnd = when(col("k") >= (window - 1) &&
      h.bitwiseAND(lit(mask)) === 0L, 1L).otherwise(0L)
    val marked = b.withColumn("__bnd", bnd)
      .withColumn("off", coalesce(
        max(when(col("__bnd") === 1L, col("k") + 1L))
          .over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // per-TERM pmod before the sum: each summand stays < P (~1e9), so
    // the 64-bit running sum is exact for chunks up to ~9·10⁹ bytes —
    // without it a term reaches 262·(P−1) ≈ 2.6e11 and a single cut-free
    // chunk past ~35 MB wraps the raw sum, silently diverging from the
    // streaming twin's stepwise floorMod accumulation (which is a true
    // modular fold at ANY length). The position cube is reduced mod P
    // PER MULTIPLY (fold rel+13 first, square mod P, then one more
    // multiply mod P — each intermediate < P² ≈ 1e18 < 2⁶³): the raw
    // triple product overflows at rel ≈ 2.1e6, where ANSI mode THROWS
    // mid-scan on any cut-free region past ~2 MB. True modular
    // arithmetic gives the same value wherever the raw cube fit — i.e.
    // everywhere the operator was previously exact — and stays exact at
    // ANY offset (the streaming twin folds the same way).
    val r0 = pmod(col("k") - col("off") + 13L, lit(P))
    val chunks = marked.groupBy(col("id"), col("off"))
      .agg(count(lit(1)).as("len"),
        pmod(sum(pmod((col("b") + 7L) *
          pmod(pmod(r0 * r0, lit(P)) * r0, lit(P)), lit(P))), lit(P))
          .as("chunk_sig"))
    chunks.withColumn("chunk_idx",
        row_number().over(Window.partitionBy("id").orderBy("off"))
          .cast("long"))
      .select(col("id"), col("chunk_idx"), col("off"), col("len"),
        col("chunk_sig"))
  }
}
