package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.RangeJoinBinning

/** The injected optimizer rule must turn a nested-loop range join into a
  * hash equi-join on the bin — with BIT-IDENTICAL results — and must stay
  * completely inert while its conf is unset. */
class RangeJoinBinningSpec extends AnyFunSuite {

  private def withExtSession(f: SparkSession => Unit): Unit = {
    val base = SparkTestBase.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try f(s)
      finally s.conf.unset(RangeJoinBinning.BinWidthKey)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("range join becomes a hash join on the bin; results identical") {
    withExtSession { s =>
      import s.implicits._
      // points and intervals spanning NEGATIVES (the floor-vs-truncate
      // trap) plus empty (lo > hi) and wide intervals
      val points = (-50L to 120L by 3).map(p => (p, s"p$p"))
        .toDF("p", "ptag")
      val intervals = Seq(
        (-45L, -30L, "neg"), (-5L, 12L, "straddle"), (40L, 40L, "unit"),
        (90L, 130L, "tail"), (60L, 50L, "empty"), (0L, 99L, "wide"),
        // inverted interval whose floor-bins ALSO invert (60→3, 20→1 at
        // W=16): must stay a legal no-match row, not a Sequence crash
        (60L, 20L, "inverted_bins"), (10L, -40L, "inverted_neg"))
        .toDF("lo", "hi", "itag")
      val join = () => points.join(intervals,
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("p", "ptag", "lo", "hi", "itag")
      // control: rule off → BNLJ (and the ground-truth row set)
      val offRows = join().collect().map(_.toSeq).toSet
      val offPlan = join().queryExecution.executedPlan.toString
      assert(offPlan.contains("BroadcastNestedLoopJoin"),
        s"control should nested-loop:\n$offPlan")
      // rule on → hash join on the bin, no BNLJ, same rows
      s.conf.set(RangeJoinBinning.BinWidthKey, "16")
      val onDf = join()
      val onPlan = onDf.queryExecution.executedPlan.toString
      assert(!onPlan.contains("BroadcastNestedLoopJoin") &&
        !onPlan.contains("CartesianProduct"),
        s"rule did not fire:\n$onPlan")
      assert(onPlan.contains("HashJoin") || onPlan.contains("SortMergeJoin"),
        s"expected an equi join:\n$onPlan")
      assert(onDf.collect().map(_.toSeq).toSet === offRows)
    }
  }

  test("inert when an equi key already exists or types aren't integral") {
    withExtSession { s =>
      import s.implicits._
      s.conf.set(RangeJoinBinning.BinWidthKey, "16")
      // already an equi key → untouched (exactly one join, no Generate)
      val a = Seq((1L, 5L), (2L, 9L)).toDF("k", "v")
      val b = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("k2", "lo", "hi")
      val withKey = a.join(b, col("k") === col("k2") &&
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(!withKey.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"), "rule fired despite an equi key")
      assert(withKey.collect().map(_.getLong(0)).toSeq === Seq(1L))
      // double-typed bounds → untouched (bin floor is integral-only)
      val dp = Seq(1.5d, 7.2d).toDF("p")
      val di = Seq((1.0d, 8.0d)).toDF("lo", "hi")
      val dj = dp.join(di, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(!dj.queryExecution.optimizedPlan.toString
        .contains("__graft_bin"))
      assert(dj.count() === 2L)
    }
  }

  test("strict bounds and the SQL surface") {
    withExtSession { s =>
      s.conf.set(RangeJoinBinning.BinWidthKey, "8")
      s.range(0, 100).createOrReplaceTempView("pts")
      s.sql("SELECT 10 AS lo, 20 AS hi UNION ALL SELECT 50, 54")
        .createOrReplaceTempView("iv")
      val q = s.sql(
        "SELECT id, lo FROM pts JOIN iv ON id > lo AND id < hi")
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // (10,20) admits 11..19 = 9 rows; (50,54) admits 51..53 = 3 rows
      assert(q.count() === 12L)
    }
  }
}
