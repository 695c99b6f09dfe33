package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object SigDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .filter(col("doc_id") < 3)
    val sigs = graft.operators.Dedup.minhashSignature(docs, "text", "doc_id")
    sigs.orderBy("id").collect().foreach { r =>
      println(s"SIG ${r.getLong(0)} ${r.getSeq[Long](1).mkString(",")}")
    }
    spark.stop()
  }
}
