package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming scale receipt (round-16 verdict task 6): drive the
  * DECLARED mixed curation chain — stateless JSON stages + the
  * transformWithState line-dedup twin, wired through
  * [[graft.streaming.StreamingFunnel.observed]] exactly like the
  * parity specs — over a scale-rung documents fixture in N real
  * micro-batches, and report the numbers a capacity plan needs:
  * per-batch wall, input rows, state-store rows/bytes, and the
  * end-to-end rows/s. The duplicate-heavy zipf rung (`/tmp/sf1z`) is
  * the interesting input: the line-dedup state should grow with
  * DISTINCT boilerplate lines, not with input volume, and batch
  * durations should stay flat — unbounded state or rising batch times
  * is exactly how a 100 TB streaming curation job dies.
  *
  * Usage: runMain graft.tools.StreamLab <sfDir> [nBatches=20]
  * (one JSON line per batch + one summary line) */
object StreamLab {

  private val chainJson =
    """{"name": "stream_curation", "steps": [
      |  {"op": "normalize", "col": "text"},
      |  {"op": "quality_filter", "text": "text", "min_score": 300}
      |]}""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.build(sfDir, cpus)
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val slices = (0 until nBatches).map(i =>
      docs.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === i))

    val root = Files.createTempDirectory("graft-streamlab").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").json(inDir)
    val width = 8 // the declared line_dedup stage's default width
    val stages = graft.pipeline.SpecLoader.stagesFromJson(chainJson) ++
      Seq(
        ("line_occurrences", (d: DataFrame) =>
          graft.operators.TextAnalysis
            .fixedWidthLines(d, "text", "doc_id", width)),
        ("line_dedup", (d: DataFrame) =>
          graft.streaming.StatefulLineDedup.verdicts(
            d.select(col("line"), col("id"), col("pos"))
              .as[graft.streaming.LineOcc], maxDocFreq = 1)
            .filter(col("kept") === 1L).toDF()))
    val observed = graft.streaming.StreamingFunnel
      .observed(stream, stages)
    val q = observed.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("noop").start()
    def f1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    var totalRows = 0L
    val t0 = System.nanoTime()
    val batchRows = new scala.collection.mutable.ArrayBuffer[String]()
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        val json = slice.toJSON.collect().mkString("\n")
        Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
        val tb = System.nanoTime()
        q.processAllAvailable()
        val wallMs = (System.nanoTime() - tb) / 1e6
        val p = q.lastProgress
        val in = if (p == null) 0L else p.numInputRows
        totalRows += in
        val (stRows, stBytes) =
          if (p == null || p.stateOperators.isEmpty) (0L, 0L)
          else (p.stateOperators.map(_.numRowsTotal).sum,
            p.stateOperators.map(_.memoryUsedBytes).sum)
        batchRows += s"""{"batch":$i,"wall_ms":${f1(wallMs)},""" +
          s""""input_rows":$in,"state_rows":$stRows,""" +
          s""""state_bytes":$stBytes}"""
      }
    } finally q.stop()
    val totalSec = (System.nanoTime() - t0) / 1e9
    batchRows.foreach(println)
    val funnel = graft.streaming.StreamingFunnel
      .funnel(q.recentProgress.toSeq)
      .map { case (i, op, n) => s""""$i:$op":$n""" }
      .mkString("{", ",", "}")
    println(s"""{"summary":"streamlab","sf":"$sfDir",""" +
      s""""batches":$nBatches,"input_rows":$totalRows,""" +
      s""""total_sec":${f1(totalSec)},""" +
      s""""rows_per_sec":${f1(totalRows / totalSec)},""" +
      s""""funnel":$funnel}""")
    spark.stop()
  }
}
