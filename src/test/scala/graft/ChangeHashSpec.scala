package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{ChangeHash, Crc32Q}

/** F2/F3 semantics (reference `internal/recon/recon.go:133-156`): token
  * precedence updated_at → updated-at → index → canonical JSON; empty
  * string counts as absent; canonical JSON sorts keys alphabetically. */
class ChangeHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("token precedence chain incl. empty-as-absent") {
    val df = Seq(
      ("r1", "U1", "U2", "I"),   // all present → updated_at
      ("r2", "", "U2", "I"),     // empty updated_at → updated-at
      ("r3", "", "", "I"),       // → index
      ("r4", "", "", "")         // → canonical JSON fallback
    ).toDF("id", "updated_at", "updated-at", "index")
    val got = df.select(col("id"), ChangeHash.hashToken(df).as("tok"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("r1") === "U1")
    assert(got("r2") === "U2")
    assert(got("r3") === "I")
    // fallback = canonical JSON of the whole record, keys sorted:
    assert(got("r4") ===
      """{"id":"r4","index":"","updated-at":"","updated_at":""}""")
  }

  test("canonical JSON is invariant under column order") {
    val df1 = Seq(("1", "x")).toDF("a", "b")
    val df2 = Seq(("x", "1")).toDF("b", "a")
    val j1 = df1.select(ChangeHash.canonicalJson(df1)).first().getString(0)
    val j2 = df2.select(ChangeHash.canonicalJson(df2)).first().getString(0)
    assert(j1 === j2)
    assert(j1 === """{"a":"1","b":"x"}""")
  }

  test("changeHash = crc32q of selected token") {
    val df = Seq(("k1", "v1")).toDF("external_id", "updated_at")
    val h = df.select(ChangeHash.changeHash(df)).first().getLong(0)
    assert(h === 1268329572L) // crc32q("v1")
    // fallback path hashes the canonical JSON:
    val df2 = Seq(("1", "x")).toDF("a", "b")
    val h2 = df2.select(ChangeHash.changeHash(df2)).first().getLong(0)
    assert(h2 === 2629098276L) // crc32q("{\"a\":\"1\",\"b\":\"x\"}")
  }
}
