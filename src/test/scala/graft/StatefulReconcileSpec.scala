package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Crc32Q
import graft.streaming.{ChangeEvent, KeyedRecord, StatefulReconcile}

/** State must live ACROSS micro-batches: batch 2 sees batch 1's hashes. */
class StatefulReconcileSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("changelog reconcile across micro-batches with tombstones") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-sfr").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val schema = "external_id STRING, token STRING, tombstone BOOLEAN"
    val stream = spark.readStream.schema(schema).json(inDir).as[KeyedRecord]
    val events = StatefulReconcile.changelog(stream)
    val q = events.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("sfr_out").start()
    try {
      Files.writeString(Paths.get(s"$inDir/b1.json"),
        """{"external_id":"a","token":"t1","tombstone":false}
          |{"external_id":"b","token":"t1","tombstone":false}""".stripMargin)
      q.processAllAvailable()
      val ev1 = spark.table("sfr_out").as[ChangeEvent].collect()
        .map(e => e.external_id -> e.op).toSet
      assert(ev1 === Set("a" -> "create", "b" -> "create"))

      // batch 2: a unchanged (no emit), b changed (create), b's old key c
      // absent is NOT a delete (changelog semantics); explicit tombstone
      // for a → delete
      Files.writeString(Paths.get(s"$inDir/b2.json"),
        """{"external_id":"a","token":"t1","tombstone":false}
          |{"external_id":"b","token":"t2","tombstone":false}
          |{"external_id":"a","token":"","tombstone":true}""".stripMargin)
      q.processAllAvailable()
      val ev2 = spark.table("sfr_out").as[ChangeEvent].collect()
      assert(ev2.length === 4) // 2 from batch1 + b:create + a:delete
      val batch2 = ev2.drop(2).map(e => e.external_id -> e.op).toSet
      assert(batch2 === Set("b" -> "create", "a" -> "delete"))
      // hash parity with the batch reconciler:
      assert(ev2.find(e => e.external_id == "b" && e.hash == Crc32Q.computeUtf8("t2")).isDefined)
    } finally q.stop()
  }

  test("transformWithState form: event parity with flatMapGroupsWithState") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tws").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val schema = "external_id STRING, token STRING, tombstone BOOLEAN"
    val stream = spark.readStream.schema(schema).json(inDir).as[KeyedRecord]
    val events = StatefulReconcile.changelogTws(stream)
    // transformWithState's contract: RocksDB state store only (session
    // conf; restored below so other streaming suites keep the default)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val q = events.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .format("memory").queryName("tws_out").start()
    try {
      // batch 1: identical to the legacy-API test above
      Files.writeString(Paths.get(s"$inDir/b1.json"),
        """{"external_id":"a","token":"t1","tombstone":false}
          |{"external_id":"b","token":"t1","tombstone":false}""".stripMargin)
      q.processAllAvailable()
      val ev1 = spark.table("tws_out").as[ChangeEvent].collect()
        .map(e => e.external_id -> e.op).toSet
      assert(ev1 === Set("a" -> "create", "b" -> "create"))

      // batch 2: unchanged key silent, changed key creates, tombstone deletes
      Files.writeString(Paths.get(s"$inDir/b2.json"),
        """{"external_id":"a","token":"t1","tombstone":false}
          |{"external_id":"b","token":"t2","tombstone":false}
          |{"external_id":"a","token":"","tombstone":true}""".stripMargin)
      q.processAllAvailable()
      val ev2 = spark.table("tws_out").as[ChangeEvent].collect()
      assert(ev2.length === 4)
      assert(ev2.drop(2).map(e => e.external_id -> e.op).toSet ===
        Set("b" -> "create", "a" -> "delete"))
      // identical hash values (CRC32-Q over token) as the legacy form
      assert(ev2.exists(e =>
        e.external_id == "b" && e.hash == Crc32Q.computeUtf8("t2")))

      // batch 3: tombstone for the already-deleted key emits nothing;
      // re-arrival of a deleted key re-creates
      Files.writeString(Paths.get(s"$inDir/b3.json"),
        """{"external_id":"a","token":"","tombstone":true}
          |{"external_id":"a","token":"t3","tombstone":false}""".stripMargin)
      q.processAllAvailable()
      val ev3 = spark.table("tws_out").as[ChangeEvent].collect()
      assert(ev3.length === 5)
      assert(ev3.last.external_id === "a" && ev3.last.op === "create" &&
        ev3.last.hash === Crc32Q.computeUtf8("t3"))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("transformWithState TTL: evicted key re-emits create on re-arrival") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ttl").toString
    val inDir = s"$root/in"; Files.createDirectories(Paths.get(inDir))
    val schema = "external_id STRING, token STRING, tombstone BOOLEAN"
    val stream = spark.readStream.schema(schema).json(inDir).as[KeyedRecord]
    // 1-second TTL: long enough to survive within-batch processing, short
    // enough that a 3s sleep between batches guarantees eviction.
    val events = StatefulReconcile.changelogTws(stream,
      ttl = Some(java.time.Duration.ofSeconds(1)))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime mode (forced by TTL) keeps running no-data batches
    // for timer/TTL bookkeeping, so processAllAvailable never settles —
    // poll the sink with a deadline instead.
    val q = events.writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .format("memory").queryName("ttl_out").start()
    def awaitRows(n: Long, timeoutMs: Long = 60000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (spark.table("ttl_out").count() < n) {
        q.exception.foreach(throw _)
        assert(System.currentTimeMillis() < deadline,
          s"timed out waiting for $n rows, have ${spark.table("ttl_out").count()}")
        Thread.sleep(250)
      }
    }
    try {
      Files.writeString(Paths.get(s"$inDir/b1.json"),
        """{"external_id":"a","token":"t1","tombstone":false}""")
      awaitRows(1)
      Thread.sleep(3000) // let the hash state expire
      // identical token again: WITHOUT TTL this would be silent
      // (unchanged); after eviction it re-emits create — the documented
      // at-least-once trade the idempotent sink absorbs
      Files.writeString(Paths.get(s"$inDir/b2.json"),
        """{"external_id":"a","token":"t1","tombstone":false}""")
      awaitRows(2)
      val ev = spark.table("ttl_out").as[ChangeEvent].collect()
      assert(ev.length === 2)
      assert(ev.forall(e => e.op == "create" &&
        e.hash == Crc32Q.computeUtf8("t1")))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
