package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StatefulDebounce, TimedEvent}

/** The previous-SURVIVOR debounce needs its survivor chain to live across
  * micro-batches — and to differ from the stateless previous-ROW form on
  * long bursts (that difference is the whole point of the operator). */
class StatefulDebounceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("survivor chain: burst suppression within and across micro-batches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sdb").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val schema = "k STRING, t LONG, event_id LONG"
    val stream = spark.readStream.schema(schema).json(inDir).as[TimedEvent]
    val q = StatefulDebounce.survivors(stream, minGap = 300L)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("sdb_out").start()
    try {
      // batch 1, key u: burst at 0,100,200,290 — previous-ROW debounce
      // would revive t=290 later in the burst... here ONLY t=0 survives;
      // then t=350 (≥300 after survivor 0) survives. Out-of-order input
      // (350 before 100) must not change the outcome.
      Files.writeString(Paths.get(s"$inDir/b1.json"),
        """{"k":"u","t":0,"event_id":1}
          |{"k":"u","t":350,"event_id":5}
          |{"k":"u","t":100,"event_id":2}
          |{"k":"u","t":200,"event_id":3}
          |{"k":"u","t":290,"event_id":4}""".stripMargin)
      q.processAllAvailable()
      val b1 = spark.table("sdb_out").as[TimedEvent].collect()
        .map(_.event_id).toSet
      assert(b1 === Set(1L, 5L))

      // batch 2: t=500 is only 150 after the batch-1 survivor at 350 —
      // suppressed ONLY IF state crossed the batch boundary; t=700 ok.
      Files.writeString(Paths.get(s"$inDir/b2.json"),
        """{"k":"u","t":500,"event_id":6}
          |{"k":"u","t":700,"event_id":7}
          |{"k":"v","t":10,"event_id":8}""".stripMargin)
      q.processAllAvailable()
      val all = spark.table("sdb_out").as[TimedEvent].collect()
        .map(_.event_id).toSet
      assert(all === Set(1L, 5L, 7L, 8L))
    } finally q.stop()

    // divergence from the stateless previous-ROW form on 0, 250, 500
    // with gap 300: row-form drops 250 (gap 250) and then ALSO drops 500
    // (measured against the dropped row at 250); the survivor form keeps
    // 500 (measured against the surviving 0). A dropped event must not
    // shadow later ones -- that's the survivor semantics.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val batch = Seq(("u", 0L, 1L), ("u", 250L, 2L), ("u", 500L, 3L))
      .toDF("k", "t", "event_id")
    val rowForm = graft.operators.EventAnalytics.debounce(batch,
      Seq(col("k")), Seq(col("t"), col("event_id")), "t", 300L)
      .select("event_id").as[Long].collect().toSet
    val survivorForm = StatefulDebounce.survivors(
      batch.as[TimedEvent], 300L).collect().map(_.event_id).toSet
    assert(rowForm === Set(1L))            // 500 hidden behind the dropped 250
    assert(survivorForm === Set(1L, 3L))   // survivor chain sees 500 - 0
  }
}
