package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shuffle-partition derivation the shared session builder
  * applies (round-16 VERDICT task 1): one partition per 4 MiB of
  * scanned fixture bytes, floored at the core count, capped at 4096 —
  * the rule that replaces the manual SPARK_GRAFT_SHUFFLE knob the 100×
  * rung proved to be the last scale superlinearity. */
class GraftSessionSpec extends AnyFunSuite {

  private def dirOfBytes(n: Long): String = {
    val d = Files.createTempDirectory("graft-session-spec")
    // split across a nested layout to pin the recursive walk
    val sub = Files.createDirectory(d.resolve("t.parquet"))
    Files.write(sub.resolve("part-0"), new Array[Byte]((n / 2).toInt))
    Files.write(d.resolve("t2.parquet"),
      new Array[Byte]((n - n / 2).toInt))
    d.toString
  }

  test("small fixtures floor at the core count (never idle a core)") {
    // sf0.1 is ~17.5 MB → 5 derived partitions, floored to 32 cores:
    // the gate scale keeps the exact session shape every prior round ran
    val d = dirOfBytes(6L << 20)
    assert(GraftSession.derivedShufflePartitions(d, 32) === 32)
    // 6 MiB derives ceil(6/4) = 2, floored at cores = 4
    assert(GraftSession.derivedShufflePartitions(d, 4) === 4)
  }

  test("partition count is ceil(bytes / 4 MiB) once past the core floor") {
    val d = dirOfBytes((4L << 20) * 10 + 1) // 40 MiB + 1 byte → 11
    assert(GraftSession.derivedShufflePartitions(d, 4) === 11)
    assert(GraftSession.derivedShufflePartitions(d, 32) === 32)
  }

  test("the 100x-rung shape derives without a knob: 1.6 GB → ~384 " +
      "partitions, the neighborhood the round-15 rung experiments " +
      "proved out at 320") {
    // don't allocate 1.6 GB — pin the arithmetic on the same number
    val bytes = 1608261554L
    val derived = (bytes + GraftSession.TargetBytesPerPartition - 1) /
      GraftSession.TargetBytesPerPartition
    assert(derived === 384L)
    assert(derived >= 320L && derived <= 512L)
  }

  test("derivation caps at 4096 (task-launch overhead bound)") {
    val bytes = 100L << 30 // a 100 GiB fixture would derive 25600
    val capped = math.min(GraftSession.MaxPartitions,
      math.max(32, (bytes + GraftSession.TargetBytesPerPartition - 1) /
        GraftSession.TargetBytesPerPartition)).toInt
    assert(capped === 4096)
  }

  test("inputBytes walks nested parquet dirs recursively") {
    val d = dirOfBytes(1234)
    assert(GraftSession.inputBytes(d) === 1234L)
  }
}
