package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

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
    // shared builder: shuffle partitions DERIVE from the rung fixture's
    // input bytes (the round-16 auto-sizing — on a real cluster this is
    // what the resource manager scales); SPARK_GRAFT_SHUFFLE still
    // overrides inside GraftSession for experiments that isolate the
    // partition knob from the plan shape
    val spark = graft.GraftSession.build(sfDir, cpus.toInt)
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
      // the listener bus drains asynchronously: poll until the shuffle
      // counters are quiescent (unchanged across two 100 ms reads, after
      // at least one stage landed or 3 s passed) — a fixed sleep drops
      // late stage events on a loaded host and bleeds them into the
      // next query's totals, skewing the rung numbers this tool exists
      // to produce
      var last = -1L
      var stableSince = System.nanoTime()
      while ({
        val cur = totalRows + totalBytes
        val changed = cur != last
        if (changed) { last = cur; stableSince = System.nanoTime() }
        Thread.sleep(100)
        val quietMs = (System.nanoTime() - stableSince) / 1e6
        changed || quietMs < 300
      } && (System.nanoTime() - t0) / 1e9 < sec + 10) ()
      println(s"""{"rung":"$sfDir","q":"$name","sec":${f3(sec)},""" +
        s""""rows_out":$out,"shuffle_rows":$totalRows,""" +
        s""""peak_stage_rows":$peakStageRows,""" +
        s""""shuffle_mb":${f3(totalBytes / 1e6)}}""")
    }
    spark.stop()
  }
}
