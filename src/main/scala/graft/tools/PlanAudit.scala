package graft.tools

import org.apache.spark.sql.SparkSession

/** Whole-battery physical-plan sweep: flags every query whose plan
  * contains a BroadcastNestedLoopJoin or CartesianProduct, with counts —
  * the global form of PlanShapeSpec's per-query no-BNLJ pins. Legitimate
  * hits are the 1-row-aggregate broadcast crosses (`crossJoin(broadcast(
  * stats))` — a 1×N nested loop IS the right plan for a 1-row build
  * side); anything else is a scale bug. Output is one line per flagged
  * query plus a summary, for PLANS.md's audit appendix.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    var errors = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
      case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString
          val bnlj = plan.sliding("BroadcastNestedLoopJoin".length)
            .count(_ == "BroadcastNestedLoopJoin")
          val cart = plan.sliding("CartesianProduct".length)
            .count(_ == "CartesianProduct")
          if (bnlj + cart > 0) {
            flagged += 1
            println(s"AUDIT $name bnlj=$bnlj cartesian=$cart")
          }
        } catch {
          case e: Throwable =>
            errors += 1
            println(s"AUDIT $name PLAN-ERROR ${e.getMessage.take(100)}")
        }
    }
    println(s"AUDIT_SUMMARY total=${graft.SparkEntry.queries.size} " +
      s"flagged=$flagged errors=$errors")
    spark.stop()
  }
}
