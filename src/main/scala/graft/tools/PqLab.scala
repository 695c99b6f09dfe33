package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

object PqLab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = emb.filter(col("id") < 10)
    val c = emb.filter(col("id") >= 10)
    val exact = Similarity.bruteForceTopK(q, c, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (nc <- Seq(32, 64, 128); ns <- Seq(4, 8); rr <- Seq(0, 15, 25, 50)) {
      val pq = Similarity.annTopKIvfPq(q, c, 5, nCells = 16, nProbe = 4,
          nSub = ns, nCentroids = nc, rerank = rr)
        .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = exact.count(pq.contains).toDouble / exact.size
      println(f"PQLAB nCentroids=$nc%3d nSub=$ns rerank=$rr%2d recall=$rec%.2f")
    }
    val ivf = Similarity.annTopKIvf(q, c, 5, nCells = 16, nProbe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"PQLAB ivf recall=${exact.count(ivf.contains).toDouble / exact.size}%.2f")
    spark.stop()
  }
}
