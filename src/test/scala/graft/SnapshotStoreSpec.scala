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

  test("commit publishes atomically; crashed-commit orphan dir is invisible") {
    val root = Files.createTempDirectory("graft-st2").toString
    val store = new SnapshotStore(spark, root)
    def img(rows: (String, Long)*) = rows.toSeq.toDF("external_id", "hash")

    store.commit("i", "f", img("a" -> 1L, "b" -> 2L))
    assert(store.read("i", "f").count() === 2)

    // simulate a crash mid-commit: data dir written but pointer never
    // created — must be invisible to readers
    val orphan = new java.io.File(s"$root/i/f/v-999999999999-orphan")
    img("zz" -> 9L).write.parquet(orphan.toString)
    assert(store.read("i", "f").as[(String, Long)].collect().toMap ===
      Map("a" -> 1L, "b" -> 2L))

    // next commit replaces the image, GCs the pointer-less orphan, and
    // retains the previous version for one commit cycle (in-flight readers
    // of the old pointer must not hit FileNotFoundException mid-scan)
    store.commit("i", "f", img("c" -> 3L))
    assert(store.read("i", "f").as[(String, Long)].collect().toMap ===
      Map("c" -> 3L))
    def leftover() = new java.io.File(s"$root/i/f").listFiles()
      .map(_.getName).filter(n => n.startsWith("v-") || n.startsWith("ptr-"))
    assert(!leftover().exists(_.contains("orphan")), "orphan must be GC'd")
    assert(leftover().count(_.startsWith("v-")) === 2)
    assert(leftover().count(_.startsWith("ptr-")) === 2)

    // a third commit ages the oldest version out: still exactly two kept
    store.commit("i", "f", img("d" -> 4L))
    assert(leftover().count(_.startsWith("v-")) === 2)
    assert(leftover().count(_.startsWith("ptr-")) === 2)
    assert(store.read("i", "f").as[(String, Long)].collect().toMap ===
      Map("d" -> 4L))
  }

  test("commit with partitions hash-clusters the state by key") {
    val root = Files.createTempDirectory("graft-st3").toString
    val store = new SnapshotStore(spark, root)
    val img = (1 to 100).map(i => (s"k$i", i.toLong))
      .toDF("external_id", "hash")
    store.commit("i", "f", img, partitions = 4)
    val dataDir = new java.io.File(s"$root/i/f").listFiles()
      .find(_.getName.startsWith("v-")).get
    val files = dataDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 4)
    assert(store.read("i", "f").count() === 100)
  }

  test("null-key batch rows are dropped, not misclassified as deletes") {
    import graft.operators.Reconcile
    val batch = Seq((null.asInstanceOf[String], "t1"), ("a", "t1"))
      .toDF("external_id", "updated_at")
    val state = Reconcile.postState(batch)
    assert(state.count() === 1) // null key excluded
    val d = Reconcile.diff(batch, state)
    assert(d.toCreate.count() === 0 && d.toDelete.count() === 0)
    assert(Reconcile.convergenceViolations(batch, state) === 0)
  }
}
