package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.NaiveBayes
import graft.state.ModelRegistry

/** Contract of the versioned model registry: a pinned snapshot is
  * score-stable under a concurrent refresh, promotion is a single
  * manifest swap (no torn cross-table mix), rollback restores the
  * previous artifact bit-exactly, and version numbers never collide
  * across rollbacks. */
class ModelRegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshRegRoot(): (ModelRegistry, String) = {
    val root = Files.createTempDirectory("graft-registry-spec").toString
    (new ModelRegistry(spark, root), root)
  }
  private def freshReg(): ModelRegistry = freshRegRoot()._1

  private val corpusA = Seq(
    (1L, "en", "the cat sat on the mat near the hat"),
    (2L, "en", "a dog and the cat ran to the barn"),
    (3L, "fr", "le chat est sur le tapis pres du chapeau"),
    (4L, "fr", "un chien et le chat vont a la grange"))
  private val corpusB = Seq( // different texts → different model
    (5L, "en", "rivers flow down to the open salt sea"),
    (6L, "fr", "les rivieres coulent vers la mer salee"))
  private val batch = Seq(
    (10L, "en", "the cat and the dog sat near the barn"),
    (11L, "fr", "le chat et le chien sont pres de la grange"))

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "lang", "text")

  private def scores(pin: ModelRegistry#Pinned): Seq[(Long, String, Long)] =
    NaiveBayes.nbcScore(df(batch), "text", "doc_id", "lang",
        NaiveBayes.nbcFromRegistry(pin))
      .select("doc_id", "pred_lang", "score_micros")
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)

  test("pinned snapshot is score-stable under concurrent refresh; " +
      "the new snapshot sees the refreshed model") {
    val reg = freshReg()
    assert(reg.currentVersion("nbc") === 0L)
    val v1 = NaiveBayes.nbcPublishModel(df(corpusA), "text", "lang",
      reg, "nbc")
    assert(v1 === 1L)
    val pin1 = reg.snapshot("nbc")
    assert(pin1.version === 1L)
    val s1 = scores(pin1)

    // concurrent refresh promotes v2 while pin1 is live
    val v2 = NaiveBayes.nbcPublishModel(df(corpusB), "text", "lang",
      reg, "nbc")
    assert(v2 === 2L && reg.currentVersion("nbc") === 2L)

    // the pinned reader re-resolves the SAME immutable version dir:
    // bit-identical scores after the refresh
    assert(scores(pin1) === s1)

    // a fresh snapshot sees the refreshed model — and it scores
    // differently (corpus B shares no content words with the batch)
    val pin2 = reg.snapshot("nbc")
    assert(pin2.version === 2L)
    assert(scores(pin2) !== s1)
  }

  test("rollback restores the previous artifact bit-exactly; a second " +
      "rollback fails; post-rollback publish never reuses a version") {
    val reg = freshReg()
    NaiveBayes.nbcPublishModel(df(corpusA), "text", "lang", reg, "nbc")
    val s1 = scores(reg.snapshot("nbc"))
    NaiveBayes.nbcPublishModel(df(corpusB), "text", "lang", reg, "nbc")
    val s2 = scores(reg.snapshot("nbc"))
    assert(s2 !== s1)

    assert(reg.rollback("nbc") === 1L)
    assert(reg.currentVersion("nbc") === 1L)
    assert(scores(reg.snapshot("nbc")) === s1)

    // history is one step deep (the AtomicTable retention contract)
    val e = intercept[IllegalArgumentException](reg.rollback("nbc"))
    assert(e.getMessage.contains("no previous version"))

    // max_version discipline: the next publish allocates v3, never a
    // collision with the demoted-but-retained v2 dir
    val v3 = NaiveBayes.nbcPublishModel(df(corpusA), "text", "lang",
      reg, "nbc")
    assert(v3 === 3L)
    assert(scores(reg.snapshot("nbc")) === s1) // corpus A again
  }

  test("promotion is all-tables-at-once: a reader resolving between " +
      "table writes of an in-flight publish still sees the old version") {
    val (reg, root) = freshRegRoot()
    reg.publish("m", Seq(
      "a" -> Seq((1L, "x")).toDF("k", "v"),
      "b" -> Seq((1L, "y")).toDF("k", "v")))
    val pin = reg.snapshot("m")
    // simulate the mid-publish window: v2's table `a` is on disk but the
    // manifest has not swapped — publish() writes all tables before
    // promote(), so a snapshot taken now must still resolve v1
    Seq((2L, "x2")).toDF("k", "v").write.parquet(s"$root/m/v-2/a")
    assert(reg.snapshot("m").version === 1L)
    assert(reg.snapshot("m").table("a").as[(Long, String)].collect()
      .toSeq === Seq((1L, "x")))
    assert(pin.table("b").as[(Long, String)].collect().toSeq ===
      Seq((1L, "y")))
  }

  test("publish claims a per-version lock: a concurrent (or crashed) " +
      "publisher fails loudly naming the lock; removal recovers; a " +
      "normal publish releases it") {
    val (reg, root) = freshRegRoot()
    reg.publish("m", Seq("a" -> Seq((1L, "x")).toDF("k", "v")))
    // simulate a concurrent publisher holding the claim for v2
    val lock = java.nio.file.Paths.get(s"$root/m/publish-lock-2")
    java.nio.file.Files.createFile(lock)
    val e = intercept[IllegalArgumentException](
      reg.publish("m", Seq("a" -> Seq((2L, "y")).toDF("k", "v"))))
    assert(e.getMessage.contains("publish-lock-2"))
    assert(reg.currentVersion("m") === 1L, "failed publish must not " +
      "promote")
    // operator recovery: remove the stale lock, retry succeeds
    java.nio.file.Files.delete(lock)
    assert(reg.publish("m",
      Seq("a" -> Seq((2L, "y")).toDF("k", "v"))) === 2L)
    // the lock was released: v3 publishes without intervention
    assert(reg.publish("m",
      Seq("a" -> Seq((3L, "z")).toDF("k", "v"))) === 3L)
  }

  test("recycled publish lock cannot overwrite a promoted version: a " +
      "publisher that read the manifest before a competitor promoted " +
      "fails loudly post-claim instead of Overwriting immutable dirs") {
    val root = Files.createTempDirectory("graft-registry-spec").toString
    val fast = new ModelRegistry(spark, root)
    fast.publish("m", Seq("a" -> Seq((1L, "x")).toDF("k", "v")))
    // slow publisher: reads maxv=1 (allocating v2); the fast competitor
    // then publishes v2 and RELEASES its lock entirely inside the race
    // window, so the slow claim succeeds on the freed lock name — the
    // post-claim manifest re-validation is all that stands between it
    // and an in-place Overwrite of the promoted immutable v-2 dirs
    var raced = false
    val slow = new ModelRegistry(spark, root) {
      override protected def onBeforeClaim(model: String,
          v: Long): Unit =
        if (!raced) {
          raced = true
          fast.publish("m", Seq("a" -> Seq((2L, "fast")).toDF("k", "v")))
        }
    }
    val e = intercept[IllegalArgumentException](
      slow.publish("m", Seq("a" -> Seq((2L, "slow")).toDF("k", "v"))))
    assert(e.getMessage.contains("manifest advanced"))
    // the promoted v2 artifact is untouched by the loser
    assert(fast.snapshot("m").version === 2L)
    assert(fast.snapshot("m").table("a").as[(Long, String)].collect()
      .toSeq === Seq((2L, "fast")))
    // and the loser's retry allocates v3 cleanly against the new head
    assert(slow.publish("m",
      Seq("a" -> Seq((3L, "slow")).toDF("k", "v"))) === 3L)
  }

  test("staleLockMs breaks a crashed publisher's lock once it ages past " +
      "the budget; a lock inside the budget still fails loudly") {
    val (reg, root) = freshRegRoot()
    reg.publish("m", Seq("a" -> Seq((1L, "x")).toDF("k", "v")))
    val lock = java.nio.file.Paths.get(s"$root/m/publish-lock-2")
    java.nio.file.Files.createFile(lock)
    // fresh lock + generous budget: the loud manual-recovery error
    val e = intercept[IllegalArgumentException](reg.publish("m",
      Seq("a" -> Seq((2L, "y")).toDF("k", "v")), staleLockMs = 60000L))
    assert(e.getMessage.contains("publish-lock-2"))
    assert(reg.currentVersion("m") === 1L)
    // age the lock past the budget: the publish breaks it and proceeds
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis - 10000L))
    assert(reg.publish("m", Seq("a" -> Seq((2L, "y")).toDF("k", "v")),
      staleLockMs = 5000L) === 2L)
  }

  test("READER-LEASE CONTRACT: a Pinned survives ONE promote cycle; " +
      "held across TWO, its version dir is GC'd and the next table " +
      "read fails loudly (bound scan time below the promote cadence)") {
    val reg = freshReg()
    reg.publish("m", Seq("a" -> Seq((1L, "x")).toDF("k", "v")))
    val pin = reg.snapshot("m") // v1
    reg.publish("m", Seq("a" -> Seq((2L, "y")).toDF("k", "v")))
    // one promote: v1 is the retained predecessor — the pin still reads
    assert(pin.table("a").as[(Long, String)].collect().toSeq ===
      Seq((1L, "x")))
    reg.publish("m", Seq("a" -> Seq((3L, "z")).toDF("k", "v")))
    // two promotes: v1 is GC'd; the stale pin fails LOUDLY, never a
    // torn half-read — this is the documented one-cycle reader lease
    val e = intercept[IllegalArgumentException](pin.table("a"))
    assert(e.getMessage.contains("missing from published version"))
  }

  test("snapshot of a never-published model and a missing table fail " +
      "loudly") {
    val reg = freshReg()
    assert(intercept[IllegalArgumentException](
      reg.snapshot("ghost")).getMessage.contains("never published"))
    reg.publish("m", Seq("a" -> Seq((1L, "x")).toDF("k", "v")))
    assert(intercept[IllegalArgumentException](
      reg.snapshot("m").table("nope")).getMessage.contains("missing"))
  }

  test("randomized publish/rollback sequences track a reference state " +
      "machine: version numbering, one-step history, and table contents") {
    val rnd = new scala.util.Random(20260816L)
    for (round <- 0 until 2) {
      val reg = freshReg()
      // reference fold of the manifest semantics
      var cur = 0L; var prev = 0L; var maxv = 0L
      val stored = scala.collection.mutable.Map[Long, Seq[(Long, Long)]]()
      for (step <- 0 until 10) {
        val doRollback = prev > 0 && rnd.nextInt(4) == 0
        if (doRollback) {
          assert(reg.rollback("m") === prev)
          cur = prev; prev = 0L
        } else {
          val rows = Seq.fill(1 + rnd.nextInt(4))(
            (rnd.nextInt(100).toLong, rnd.nextLong()))
          val v = reg.publish("m", Seq("a" -> rows.toDF("k", "v")))
          assert(v === maxv + 1, s"round $round step $step")
          stored(v) = rows
          prev = cur; cur = v; maxv = v
        }
        assert(reg.currentVersion("m") === cur)
        val read = reg.snapshot("m").table("a")
          .as[(Long, Long)].collect().toSeq.sorted
        assert(read === stored(cur).sorted,
          s"round $round step $step: v$cur content")
      }
      // exhausted-history rollback fails loudly whenever prev == 0
      if (prev == 0L && cur > 0L)
        assert(intercept[IllegalArgumentException](reg.rollback("m"))
          .getMessage.contains("no previous version"))
    }
  }

  test("kn3 publish/pin round-trip scores equal the in-session model") {
    val reg = freshReg()
    val docs = df(corpusA ++ corpusB)
    graft.operators.TextAnalysis.kn3PublishModel(docs, "text", "doc_id",
      reg, "lm")
    val pin = reg.snapshot("lm")
    val viaReg = graft.operators.TextAnalysis.kn3Score(df(batch), "text",
        "doc_id", graft.operators.TextAnalysis.kn3FromRegistry(pin))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val inSession = graft.operators.TextAnalysis.kn3Score(df(batch),
        "text", "doc_id",
        graft.operators.TextAnalysis.kn3Model(docs, "text", "doc_id"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(viaReg === inSession && pin.version === 1L)
  }
}
