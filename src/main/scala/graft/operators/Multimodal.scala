package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark side — schema, partitioning, batch shape, typed mapPartitions —
  * is real and tested. The actual media decoding is STUBBED (this
  * environment ships no image/audio codecs): `decodeStub` derives
  * deterministic fake dimensions/frames from the byte content, clearly
  * marked below. Swapping in a real decoder changes only the function body,
  * not the pipeline shape.
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

  /** ===== STUB decode =====
    * A real implementation would decode image headers / probe containers
    * here (per-partition, so codec init amortizes across the batch — the
    * same batch shape a Pandas-UDF/`mapInPandas` implementation uses in
    * PySpark). The stub derives deterministic fake dimensions from content
    * bytes; the distributed plumbing around it is the real deliverable. */
  def decodeAssets(assets: DataFrame): Dataset[DecodedMeta] = {
    val enc = Encoders.product[DecodedMeta]
    assets.select("asset_id", "modality", "content")
      .mapPartitions { rows: Iterator[Row] =>
        // per-partition "codec" init would go here
        rows.map { r =>
          val id = r.getLong(0)
          val mod = r.getString(1)
          val bytes = Option(r.getAs[Array[Byte]](2)).getOrElse(Array.empty)
          val n = bytes.length
          // STUB: fake decode — deterministic in the content
          val w = 16 + (n % 64)
          val h = 16 + ((n / 7) % 64)
          val frames = if (mod == "video") 1 + (n % 30) else 1
          DecodedMeta(id, mod, n.toLong, w, h, frames)
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

  /** ===== STUB feature extraction =====
    * Deterministic fake feature vector from content bytes (real impl: model
    * inference per partition-batch). Demonstrates the wide-row (id, vec)
    * output shape feeding [[Similarity]]. */
  def extractFeatures(assets: DataFrame, dim: Int = 8): DataFrame =
    assets.select(col("asset_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("content"), i), lit(2000L)).cast("double")
          - lit(1000.0)) / lit(1000.0)).as("vec"))
}
