package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.state.SnapshotStore

/** Two-phase commit semantics under partial failure: a leftover staging
  * directory (crash between write and rename) must never corrupt reads,
  * and the next commit must proceed normally. */
class SnapshotStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("read before first commit is empty with schema") {
    val store = new SnapshotStore(spark,
      Files.createTempDirectory("graft-st").toString)
    val s = store.read("i", "f")
    assert(s.count() === 0)
    assert(s.columns.toSeq === Seq("external_id", "hash"))
  }

  test("commit swaps atomically; leftover staged dir is harmless") {
    val root = Files.createTempDirectory("graft-st2").toString
    val store = new SnapshotStore(spark, root)
    def img(rows: (String, Long)*) = rows.toSeq.toDF("external_id", "hash")

    store.commit("i", "f", img("a" -> 1L, "b" -> 2L))
    assert(store.read("i", "f").count() === 2)

    // simulate a crashed commit: orphan staged dir with different content
    val orphan = new java.io.File(s"$root/i/f/staged-orphan")
    img("zz" -> 9L).write.parquet(orphan.toString)
    assert(store.read("i", "f").as[(String, Long)].collect().toMap ===
      Map("a" -> 1L, "b" -> 2L)) // reads still serve current

    // next commit replaces current, ignoring the orphan
    store.commit("i", "f", img("c" -> 3L))
    assert(store.read("i", "f").as[(String, Long)].collect().toMap ===
      Map("c" -> 3L))
  }

  test("commit with partitions hash-clusters the state by key") {
    val root = Files.createTempDirectory("graft-st3").toString
    val store = new SnapshotStore(spark, root)
    val img = (1 to 100).map(i => (s"k$i", i.toLong))
      .toDF("external_id", "hash")
    store.commit("i", "f", img, partitions = 4)
    val files = new java.io.File(s"$root/i/f/current").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 4)
    assert(store.read("i", "f").count() === 100)
  }
}
