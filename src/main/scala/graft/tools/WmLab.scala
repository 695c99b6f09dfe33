package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev scratchpad: decompose weighted_median cost at sf0.1. */
object WmLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LAB $label%-28s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val base = li.select(col("l_returnflag").as("flag"),
      round(col("l_extendedprice") * 100).cast("long").as("v"),
      col("l_quantity").cast("long").as("w"),
      col("l_orderkey"), col("l_linenumber"))
    for (_ <- 1 to 3) {
      time("scan4") { base.count() }
      val b = base.withColumn("__bkt", expr("v DIV 1024"))
      time("bucket-agg") {
        b.groupBy(col("flag"), col("__bkt")).agg(sum(col("w")).as("bw")).count()
      }
      val wPfx = Window.partitionBy(col("flag")).orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val crossing = b.groupBy(col("flag"), col("__bkt"))
        .agg(sum(col("w")).as("__bw"))
        .withColumn("__cumb", sum(col("__bw")).over(wPfx))
        .withColumn("__totw", sum(col("__bw")).over(Window.partitionBy(col("flag"))))
        .filter(col("__cumb") * 2 >= col("__totw"))
        .groupBy(col("flag"))
        .agg(min(col("__bkt")).as("__cbkt"),
          min_by(col("__cumb") - col("__bw"), col("__bkt")).as("__off"),
          max(col("__totw")).as("__totw"))
      time("crossing") { crossing.count() }
      time("join-sliver") {
        b.join(broadcast(crossing), "flag")
          .filter(col("__bkt") === col("__cbkt")).count()
      }
      time("full") {
        graft.operators.Transforms.weightedMedian(base, "flag", "v", "w",
          Seq(col("l_orderkey"), col("l_linenumber"))).count()
      }
      for (w <- Seq(4096L, 65536L, 262144L)) {
        time(s"full-w$w") {
          graft.operators.Transforms.weightedMedian(base, "flag", "v", "w",
            Seq(col("l_orderkey"), col("l_linenumber")), bucketWidth = w)
            .count()
        }
      }
    }
    spark.stop()
  }
}
