package graft.tools

/** Round-16 evidence tool: dump `.explain("formatted")` for a list of
  * SparkEntry queries into `<outDir>/<query>_<tag>.txt` in ONE JVM — the
  * before/after plan files the optimization log commits under
  * `plans/r16/`. Uses the shared [[graft.GraftSession]] builder so the
  * dumped plans carry the same session shape as Bench/Verify.
  * Usage: runMain graft.tools.PlanDumpBatch <tag> <outDir> q1,q2,...
  */
object PlanDumpBatch {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val outDir = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.build(sfDir, cpus)
    new java.io.File(outDir).mkdirs()
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${q}_$tag.txt", "UTF-8")
      try w.println(txt) finally w.close()
      println(s"PLANDUMP $q -> $outDir/${q}_$tag.txt")
    }
    spark.stop()
  }
}
