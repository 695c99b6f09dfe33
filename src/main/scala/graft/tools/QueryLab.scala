package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: time the stages of the shingle pipeline separately. */
object QueryLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LAB $label%-28s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("scan") { docs.count() }
    val words = docs.select(col("doc_id").as("id"),
      split(lower(trim(col("text"))), "\\s+").as("w"))
    time("words") { words.count() }
    time("words+repart") { words.repartition(col("id")).count() }
    val inv = graft.operators.Dedup.shingleInv(docs, "text", "doc_id", 5)
    time("shingleInv") { inv.count() }
    time("shingleInv again") { inv.count() }
    val pairs = inv.as("x").join(inv.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
    time("selfjoin") { pairs.count() }
    time("full ngram") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 5, 100).count()
    }
    val sigs = graft.operators.Dedup.minhashSignature(docs, "text", "doc_id")
    time("minhash sigs") { sigs.count() }
    time("minhash lsh") {
      graft.operators.Dedup.minhashLshCandidates(sigs).count()
    }
    spark.stop()
  }
}
