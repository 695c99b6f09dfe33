package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
object AHashLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val len = length(encode(col("text"), "UTF-8"))
    def assets = graft.operators.Transforms.rebalanceIfNarrow(
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .filter(col("doc_id") % 5 === 0), col("doc_id"))
      .select(col("doc_id").cast("long").as("asset_id"),
        Multimodal.bmpPixelContent(col("doc_id").cast("long"),
          (len % 16 + 8).cast("long"), (len % 12 + 8).cast("long")).as("content"))
    def time(lbl: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"LAB $lbl%-22s rows=$n%-8d ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    println("input partitions: " + spark.read.parquet("/root/testdata/sf0.1/documents.parquet").rdd.getNumPartitions)
    println("assets partitions: " + assets.rdd.getNumPartitions)
    time("synthesis only") { assets.agg(sum(length(col("content")))).collect(); 0L }
    val forced = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") % 5 === 0).repartition(32)
      .select(col("doc_id").cast("long").as("asset_id"),
        Multimodal.bmpPixelContent(col("doc_id").cast("long"),
          (len % 16 + 8).cast("long"), (len % 12 + 8).cast("long")).as("content"))
    time("forced 32-part synth") { forced.agg(sum(length(col("content")))).collect(); 0L }
    time("forced again") { forced.agg(sum(length(col("content")))).collect(); 0L }
    time("synthesis again") { assets.agg(sum(length(col("content")))).collect(); 0L }
    time("full ahash") { Multimodal.imageAHash(assets, "asset_id", "content").count() }
    time("full ahash again") { Multimodal.imageAHash(assets, "asset_id", "content").count() }
    spark.stop()
  }
}
