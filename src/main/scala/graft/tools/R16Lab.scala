package graft.tools

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Round-16 optimization scratchpad: run a comma-separated list of
  * SparkEntry queries for N iterations each inside ONE GraftSession JVM,
  * printing per-iteration wall / GC-delta / JIT-delta and the job+stage
  * counts the query scheduled (from the listener bus). Iteration 1 ≈ the
  * bench's single-shot cost (plus memo builds it shares with the rest of
  * the battery); the warm floor separates plan cost from one-time JVM
  * work; the job/stage counts expose barrier-heavy shapes (every job is
  * a driver round-trip at any scale). */
object R16Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names = if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("closeness_centrality")
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.build(sfDir, cpus)
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
        }
      })

    def gcMillis: Long = ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def jitMillis: Long = ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime

    // __overhead: the fixed-cost floor — trivial jobs, tiny shuffles,
    // tiny checkpoint round-trips — the per-barrier price every
    // iterative operator pays regardless of data volume.
    def overhead(): Unit = {
      def timed(label: String, reps: Int)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        (1 to reps).foreach(_ => f)
        val ms = (System.nanoTime() - t0) / 1e6 / reps
        println(f"R16LAB __overhead $label%-28s ${ms}%8.1f ms/op x$reps")
      }
      import org.apache.spark.sql.functions._
      timed("range.count (no shuffle)", 20) { spark.range(100).count() }
      timed("groupBy.count (1 shuffle)", 20) {
        spark.range(100).groupBy((col("id") % 7).as("k")).count().count()
      }
      timed("ckptLight tiny", 10) {
        org.apache.spark.sql.GraftSqlBridge.localCheckpointFreshStats(
          spark.range(100).select(col("id"), (col("id") % 7).as("k"))
            .groupBy("k").count()).unpersist()
      }
      timed("ckptLightCounted tiny", 10) {
        org.apache.spark.sql.GraftSqlBridge.localCheckpointFreshStatsCounted(
          spark.range(100).select(col("id"), (col("id") % 7).as("k"))
            .groupBy("k").count())._1.unpersist()
      }
      timed("2-shuffle chain", 10) {
        spark.range(1000).select(col("id"), (col("id") % 97).as("k"))
          .groupBy("k").count()
          .groupBy((col("k") % 7).as("j")).agg(sum("count")).count()
      }
      timed("range.count 1 partition", 20) {
        spark.range(0, 100, 1, 1).count()
      }
      timed("range.count 4 partitions", 20) {
        spark.range(0, 100, 1, 4).count()
      }
      // save + restore the values the probes mutate: restoring a
      // hardcoded "32" would leave queries measured after __overhead
      // running under a different partition count than the bench
      // configuration whenever SPARK_GRAFT_CPUS/SPARK_GRAFT_SHUFFLE
      // differ (ADVICE r16)
      val aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
      val parts0 = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      timed("groupBy.count AQE OFF", 20) {
        spark.range(100).groupBy((col("id") % 7).as("k")).count().count()
      }
      timed("2-shuffle chain AQE OFF", 10) {
        spark.range(1000).select(col("id"), (col("id") % 97).as("k"))
          .groupBy("k").count()
          .groupBy((col("k") % 7).as("j")).agg(sum("count")).count()
      }
      spark.conf.set("spark.sql.adaptive.enabled", aqe0)
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      timed("groupBy.count shuffle=4", 20) {
        spark.range(100).groupBy((col("id") % 7).as("k")).count().count()
      }
      spark.conf.set("spark.sql.shuffle.partitions", parts0)
    }

    names.foreach {
      case "__overhead" => overhead()
      case q =>
      val fn = graft.SparkEntry.queries(q)
      (1 to iters).foreach { i =>
        val (g0, c0) = (gcMillis, jitMillis)
        jobs.set(0); stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // drain listener bus
        println(f"R16LAB $q%-26s it=$i wall=$dt%6.2fs rows=$n%-8d " +
          f"jobs=${jobs.get}%-3d stages=${stages.get}%-4d " +
          f"tasks=${tasks.get}%-5d gc=${gcMillis - g0}%4dms " +
          f"jit=${jitMillis - c0}%5dms")
      }
    }
    spark.stop()
  }
}
