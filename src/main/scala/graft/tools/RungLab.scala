package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scale-rung probe: run named SparkEntry queries on a fixture dir and
  * report, per query, wall seconds, OUTPUT rows, and the shuffle-write
  * volume (total + peak single-stage records, total MB) from stage
  * metrics — the numbers the BASELINE.md rung tables track (a query
  * whose shuffle rows grow super-linearly in the fixture is the one
  * that breaks first at 100 TB, whatever its wall clock says today).
  * Usage: RungLab <sfDir> <q1,q2,...>   (one JSON line per query) */
object RungLab {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // rung experiments: a 100x fixture with 32 shuffle partitions gives
    // each task 100x the per-task hash state of the sf0.1 shape — on a
    // real cluster partitions scale with the data; this knob lets the
    // rung table separate "plan got worse" from "partitions outgrown"
    val shuffleParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    @volatile var totalRows = 0L
    @volatile var peakStageRows = 0L
    @volatile var totalBytes = 0L
    val listener = new SparkListener {
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          val w = m.shuffleWriteMetrics
          totalRows += w.recordsWritten
          totalBytes += w.bytesWritten
          if (w.recordsWritten > peakStageRows)
            peakStageRows = w.recordsWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).schema // plan-warm outside the timed window
      totalRows = 0L; peakStageRows = 0L; totalBytes = 0L
      val t0 = System.nanoTime()
      val out = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drains asynchronously
      println(s"""{"rung":"$sfDir","q":"$name","sec":${f3(sec)},""" +
        s""""rows_out":$out,"shuffle_rows":$totalRows,""" +
        s""""peak_stage_rows":$peakStageRows,""" +
        s""""shuffle_mb":${f3(totalBytes / 1e6)}}""")
    }
    spark.stop()
  }
}
