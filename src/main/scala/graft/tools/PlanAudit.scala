package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

/** Whole-battery physical-plan sweep: flags every query whose plan
  * contains a BroadcastNestedLoopJoin or CartesianProduct, with counts —
  * the global form of PlanShapeSpec's per-query no-BNLJ pins. Legitimate
  * hits are the 1-row-aggregate broadcast crosses (`crossJoin(broadcast(
  * stats))` — a 1×N nested loop IS the right plan for a 1-row build
  * side); anything else is a scale bug.
  *
  * Also sweeps WINDOW BOUNDEDNESS (the no-BNLJ discipline applied to
  * windows): an unpartitioned `WindowExec` moves its whole frame to one
  * task, which is only scale-safe when the frame is already bounded —
  * an aggregate, a limit, or a union of such. Every unpartitioned
  * window is counted; one whose frame source is NOT provably bounded by
  * that walk is flagged `global_window_unbounded` and must be either
  * fixed (rangedRank is the scale-correct global rank) or classified in
  * PLANS.md. The walk runs on `queryExecution.sparkPlan` — the physical
  * tree BEFORE EnsureRequirements inserts exchanges/sorts — so a
  * window's child is its actual frame source, and treats
  * cardinality-preserving nodes (project/filter/sort/window/expand-free
  * unary ops) as pass-through. Keyed aggregates are accepted as bounded
  * by convention (the known frames: shard offsets, |strata| shares,
  * 1-row totals); the convention is what PLANS.md's classification
  * table documents.
  *
  * Output is one line per flagged query plus a summary, for PLANS.md's
  * audit appendix.
  *
  * Usage: runMain graft.tools.PlanAudit <sfDir>
  */
object PlanAudit {

  /** Is this plan's output provably bounded (not corpus-sized)?
    * Aggregates and limits bound; TakeOrderedAndProject IS a limit; a
    * join (equi or broadcast) of two bounded inputs is bounded; unions
    * of bounded inputs are bounded. */
  private def bounded(p: SparkPlan): Boolean = {
    val n = p.getClass.getSimpleName
    if (n.contains("Aggregate") || n.contains("Limit") ||
      n.contains("TakeOrdered")) true
    else if (n == "UnionExec" || n.contains("Join"))
      p.children.forall(bounded)
    else if (passThrough(n) && p.children.nonEmpty)
      bounded(p.children.head)
    else false
  }

  /** Unary nodes that preserve (or shrink) cardinality without being a
    * bound themselves. */
  private def passThrough(n: String): Boolean = Set(
    "ProjectExec", "FilterExec", "SortExec", "CoalesceExec",
    "WindowExec", "WindowGroupLimitExec", "DeserializeToObjectExec",
    "SerializeFromObjectExec", "MapPartitionsExec", "ColumnarToRowExec",
    "InputAdapter", "WholeStageCodegenExec", "ReusedExchangeExec",
    "ShuffleExchangeExec", "BroadcastExchangeExec",
    "AQEShuffleReadExec", "SubqueryBroadcastExec").contains(n)

  /** (unpartitioned windows, unclassified-unbounded among them). */
  private def globalWindows(plan: SparkPlan): (Int, Int) = {
    val ws = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    (ws.size, ws.count(w => !bounded(w.child)))
  }

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
    var gwTotal = 0
    var gwUnbounded = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
      case (name, fn) =>
        try {
          val phys = fn(spark, sfDir).queryExecution.sparkPlan
          val plan = phys.toString
          val bnlj = plan.sliding("BroadcastNestedLoopJoin".length)
            .count(_ == "BroadcastNestedLoopJoin")
          val cart = plan.sliding("CartesianProduct".length)
            .count(_ == "CartesianProduct")
          val (gw, gwu) = globalWindows(phys)
          gwTotal += gw
          gwUnbounded += gwu
          if (bnlj + cart > 0 || gwu > 0) {
            flagged += 1
            println(s"AUDIT $name bnlj=$bnlj cartesian=$cart" +
              (if (gwu > 0) s" global_window_unbounded=$gwu of=$gw"
               else ""))
          }
        } catch {
          case e: Throwable =>
            errors += 1
            println(s"AUDIT $name PLAN-ERROR ${e.getMessage.take(100)}")
        }
    }
    println(s"AUDIT_SUMMARY total=${graft.SparkEntry.queries.size} " +
      s"flagged=$flagged errors=$errors " +
      s"global_windows=$gwTotal unbounded=$gwUnbounded")
    spark.stop()
  }
}
