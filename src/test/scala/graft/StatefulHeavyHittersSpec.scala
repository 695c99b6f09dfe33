package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{HHEstimate, KeyedItem, StatefulHeavyHitters}

/** Space-saving invariants under micro-batching: bounded summary size,
  * eviction inheritance (count/err), counter-sum = stream length, and the
  * frequent-item guarantee (true freq > N/capacity ⇒ tracked). */
class StatefulHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("bounded summary, eviction inheritance, counters sum to N") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-shh").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val schema = "k STRING, item STRING, t LONG"
    val stream = spark.readStream.schema(schema).json(inDir)
      .as[KeyedItem]
    @volatile var last: Array[HHEstimate] = Array.empty
    val q = StatefulHeavyHitters.summarize(stream, capacity = 2)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[HHEstimate],
          id: Long) =>
        val rows = df.collect()
        if (rows.nonEmpty) last = rows
      }.start()
    try {
      // batch 1: a a b c — c arrives at a full summary, evicts min (b,1)
      // and inherits: c = (count 2, err 1)
      Files.writeString(Paths.get(s"$inDir/b1.json"),
        """{"k":"u","item":"a","t":1}
          |{"k":"u","item":"a","t":2}
          |{"k":"u","item":"b","t":3}
          |{"k":"u","item":"c","t":4}""".stripMargin)
      q.processAllAvailable()
      val s1 = last.map(e => e.item -> (e.count, e.err)).toMap
      assert(s1 === Map("a" -> ((2L, 0L)), "c" -> ((2L, 1L))))
      // batch 2: b b — b evicts the min counter; tie (a,2,0) vs (c,2,1)
      // breaks to the smaller item ⇒ a leaves, b = (3, 2), then 4
      Files.writeString(Paths.get(s"$inDir/b2.json"),
        """{"k":"u","item":"b","t":5}
          |{"k":"u","item":"b","t":6}""".stripMargin)
      q.processAllAvailable()
      val s2 = last.map(e => e.item -> (e.count, e.err)).toMap
      assert(s2 === Map("b" -> ((4L, 2L)), "c" -> ((2L, 1L))))
      // invariants: ≤ capacity entries; Σ counters = N (6 items seen);
      // any item with true freq > N/capacity (= 3) is tracked: b has 3
      assert(s2.size <= 2)
      assert(s2.values.map(_._1).sum === 6L)
      assert(s2.contains("b"))
      // estimate bound: count − err ≤ true ≤ count (b true 3: 2 ≤ 3 ≤ 4)
      assert(s2("b")._1 - s2("b")._2 <= 3L && 3L <= s2("b")._1)
    } finally q.stop()
  }

  test("keys are independent; capacity respected per key") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-shh2").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val stream = spark.readStream.schema("k STRING, item STRING, t LONG")
      .json(inDir).as[KeyedItem]
    @volatile var last: Array[HHEstimate] = Array.empty
    val q = StatefulHeavyHitters.summarize(stream, capacity = 3)
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[HHEstimate],
          id: Long) =>
        val rows = df.collect()
        if (rows.nonEmpty) last = rows
      }.start()
    try {
      val lines = (1 to 40).map { i =>
        val key = if (i % 2 == 0) "x" else "y"
        val item = s"i${(i / 2) % (if (key == "x") 5 else 2)}"
        s"""{"k":"$key","item":"$item","t":$i}"""
      }
      Files.writeString(Paths.get(s"$inDir/b1.json"), lines.mkString("\n"))
      q.processAllAvailable()
      val byKey = last.groupBy(_.k)
      assert(byKey("x").length <= 3 && byKey("y").length <= 3)
      // y sees only 2 distinct items in 20 events — both tracked exactly
      val y = byKey("y").map(e => e.item -> (e.count, e.err)).toMap
      assert(y === Map("i0" -> ((10L, 0L)), "i1" -> ((10L, 0L))))
      // per-key counter sums equal per-key stream lengths
      assert(byKey("x").map(_.count).sum === 20L)
    } finally q.stop()
  }
}
