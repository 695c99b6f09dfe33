package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.{CellVector, SemVerdict, StatefulSemDedup}

/** Streaming SemDeDup must equal the batch tier on the same corpus when
  * fed in id order: per-cell member state carried across micro-batches by
  * `transformWithState` replaces the batch in-cell self-join, and the
  * batch rule (pruned ⟺ ANY lower-id in-cell member at/above the cosine
  * threshold) is exactly the arrival-order rule when arrivals are
  * id-ordered. */
class StreamingSemDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runStream(name: String,
      slices: Seq[org.apache.spark.sql.DataFrame], thresholdPermille: Int,
      maxCell: Int = 0): Map[Long, (Long, Long)] = {
    val root = Files.createTempDirectory(s"graft-$name").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream
      .schema("cid LONG, id LONG, vec ARRAY<DOUBLE>").json(inDir)
      .as[CellVector]
    val verdicts =
      StatefulSemDedup.verdicts(stream, thresholdPermille, maxCell)
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocks)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val q = verdicts.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName(name).start()
    try {
      slices.zipWithIndex.foreach { case (slice, i) =>
        val json = slice.toJSON.collect().mkString("\n")
        Files.writeString(Paths.get(s"$inDir/b$i.json"), json)
        q.processAllAvailable()
      }
      spark.table(name).as[SemVerdict].collect()
        .map(v => v.id -> ((v.cid, v.pruned))).toMap
    } finally {
      q.stop()
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("stream-vs-batch parity on the embeddings fixture, fed in id order") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val batch = Similarity.semDedup(emb, nCells = 16,
        thresholdPermille = 350)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch.nonEmpty)
    // stream input: the batch cell assignment (stateless, covered by its
    // own specs) + the raw vector as doubles, sliced into 3 id-ordered
    // micro-batches so state must carry across batch boundaries
    val cells = Similarity.semDedup(emb, nCells = 16,
        thresholdPermille = 350)
      .select(col("cid"), col("id"))
      .join(emb.select(col("id"),
        col("vec").cast("array<double>").as("vec")), "id")
      .select(col("cid"), col("id"), col("vec"))
    val ids = cells.select("id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val slices = Seq(
      cells.filter(col("id") <= cuts(0)),
      cells.filter(col("id") > cuts(0) && col("id") <= cuts(1)),
      cells.filter(col("id") > cuts(1)))
    val got = runStream("semdd_parity", slices, thresholdPermille = 350)
    assert(got === batch)
    assert(got.values.exists(_._2 == 1L), "fixture should prune something")
  }

  test("maxCell caps state: verdicts still emitted, membership first-come") {
    // one cell; v1=(1,0), v2=(0,1) (far from v1), v3=(0.01,1) (close to
    // v2 only). Uncapped: v3 pruned by resident v2. maxCell=1: v2 gets a
    // verdict but is NOT added, so v3 survives — the documented
    // working-set divergence under the cap.
    def rows(df: => Seq[(Long, Long, Seq[Double])]) =
      df.toDF("cid", "id", "vec")
    val data = Seq(
      (7L, 1L, Seq(1.0, 0.0)), (7L, 2L, Seq(0.0, 1.0)),
      (7L, 3L, Seq(0.01, 1.0)))
    val un = runStream("semdd_uncapped", Seq(rows(data)), 900)
    assert(un === Map(1L -> ((7L, 0L)), 2L -> ((7L, 0L)),
      3L -> ((7L, 1L))))
    val capped = runStream("semdd_capped", Seq(rows(data)), 900,
      maxCell = 1)
    assert(capped === Map(1L -> ((7L, 0L)), 2L -> ((7L, 0L)),
      3L -> ((7L, 0L))))
  }
}
