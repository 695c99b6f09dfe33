package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.debug

/** Experiment: does a driver-side codegen pre-compilation pass
  * (debug.codegenStringSeq, which Janino-compiles every WholeStageCodegen
  * span into the JVM-global CodeGenerator cache) shrink a query's
  * first-execution time in local mode? Usage: WarmLab <query> [warm|cold]
  */
object WarmLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = args(0)
    val mode = if (args.length > 1) args(1) else "warm"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val fn = graft.SparkEntry.queries(qname)
    val df = fn(spark, sfDir)
    df.schema // analysis

    if (mode == "warm") {
      val w0 = System.nanoTime()
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case p => p
      }
      val n = debug.codegenStringSeq(plan).size
      println(f"WARMLAB precompile spans=$n sec=${(System.nanoTime() - w0) / 1e9}%.2f")
    }

    val t0 = System.nanoTime()
    val rows = fn(spark, sfDir).count()
    println(f"WARMLAB $qname mode=$mode rows=$rows first_sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
