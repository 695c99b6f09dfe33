package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: why does the shingle self-join not get a ReusedExchange? */
object ReuseLab {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def reused(df: org.apache.spark.sql.DataFrame): Int = {
      // execute THIS queryExecution (count() would plan a separate one and
      // the inspected AQE plan would stay isFinalPlan=false)
      df.queryExecution.toRdd.count()
      val fin = df.queryExecution.executedPlan.toString
      fin.linesIterator.count(l => l.contains("ReusedExchange")
        || l.contains("ReusedQueryStage") || l.contains("TableCacheQueryStage"))
    }

    val inv = graft.operators.Dedup.shingleInv(docs, "text", "doc_id", 5)
      .repartition(col("s"))


    // bisect: which subplan breaks sameResult?
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id").as("id"), col("text"))

    println("CONF exchange.reuse=" + spark.sessionState.conf.exchangeReuseEnabled)
    val agg1 = base.groupBy("id").agg(count(lit(1)).as("n")).repartition(col("n"))
    val b1 = agg1.as("x").join(agg1.as("y"), col("x.n") === col("y.n") && col("x.id") < col("y.id"))
    println("B1 agg selfjoin reused=" + reused(b1))
    println("B1FINAL>>>")
    println(b1.queryExecution.executedPlan.toString.linesIterator.take(40).mkString("\n"))
    println("<<<B1FINAL")

    val ex1 = base.select(col("id"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "w")))
      .repartition(col("w"))
    println("B2 explode selfjoin reused=" + reused(
      ex1.as("x").join(ex1.as("y"), col("x.w") === col("y.w") && col("x.id") < col("y.id"))))

    val wn1 = base.select(col("id"), posexplode(split(col("text"), "\\s+")).as(Seq("pos", "w")))
    val wn2 = wn1.select(col("id"), col("w"), lead(col("w"), 1).over(Window.partitionBy("id").orderBy("pos")).as("w2"))
      .filter(col("w2").isNotNull).repartition(col("w"))
    println("B3 window selfjoin reused=" + reused(
      wn2.as("x").join(wn2.as("y"), col("x.w") === col("y.w") && col("x.id") < col("y.id"))))
    // variant 1: current shape (shuffle_hash hint on y)
    val v1 = inv.as("x").join(inv.as("y").hint("shuffle_hash"),
      col("x.s") === col("y.s") && col("x.id") < col("y.id"))
    println("V1 hint   reused=" + reused(v1))

    // variant 2: no hint
    val v2 = inv.as("x").join(inv.as("y"),
      col("x.s") === col("y.s") && col("x.id") < col("y.id"))
    println("V2 nohint reused=" + reused(v2))

    // variant 3: no repartition, plain join (shuffle on s from join reqs)
    val inv3 = graft.operators.Dedup.shingleInv(docs, "text", "doc_id", 5)
    val v3 = inv3.as("x").join(inv3.as("y"),
      col("x.s") === col("y.s") && col("x.id") < col("y.id"))
    println("V3 plain  reused=" + reused(v3))

    // variant 4: AQE off, current shape
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println("V4 noaqe  reused=" + reused(v1))
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    spark.stop()
  }
}
