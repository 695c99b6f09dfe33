package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-level scale evidence the fixture files can't show (they ship
  * unpartitioned, unbucketed): dynamic partition pruning over a
  * hive-partitioned copy, and shuffle-free joins over bucketed tables.
  * These are the two table-layout levers a 100 TB deployment of this
  * engine pulls first — DPP makes dimension-filtered fact scans read
  * only the matching partitions at RUNTIME, and bucketing removes the
  * per-query exchange from every key-joined pipeline (reconcile,
  * dedup-state probes) by paying the shuffle once at write time. */
class PartitionLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    df.queryExecution.toRdd.count()
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val root = Files.createTempDirectory("graft-dpp").toString
    // fact partitioned by the join key's region-ish band (8 partitions)
    spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("band", col("o_custkey") % 8)
      .write.mode("overwrite").partitionBy("band")
      .parquet(s"$root/orders_p")
    val fact = spark.read.parquet(s"$root/orders_p")
    // selective dim: one band survives the filter — DPP should reach the
    // fact scan as a runtime subquery filter on the partition column
    val dim = spark.range(0, 8).select(col("id").as("band"),
        (col("id") * 10).as("attr"))
      .filter(col("attr") === 30) // band 3 only
    val joined = fact.join(dim, Seq("band"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no DPP filter on the fact scan:\n$plan")
    // correctness: equals the band-3 slice computed directly
    val direct = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_custkey") % 8 === 3)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect().head
    assert(joined.collect().head.toSeq === direct.toSeq)
  }

  test("bucketed tables: co-bucketed join plans with NO shuffle exchange") {
    // external-path tables: the (static) warehouse dir never comes into
    // play, each table carries its own location
    val wh = Files.createTempDirectory("graft-bucket").toString
    try {
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
      val j = spark.table("o_b").join(spark.table("li_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = finalPlan(j)
      // bucketing replaces BOTH join-side exchanges AND the aggregate's:
      // hash(o_orderkey) clustering is satisfied from the file layout
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and the result matches the unbucketed plan
      val expect = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      assert(j.collect().map(_.toSeq).toSet ===
        expect.collect().map(_.toSeq).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.sql("DROP TABLE IF EXISTS li_b")
    }
  }
}
