package graft

import org.apache.spark.sql.SparkSession

/** Fixture-schema smoke probe: asserts each testdata table's dtypes at
  * startup and NAMES the drifted column when the environment regenerates a
  * fixture with a new encoding — round 5 lost its entire event/time-series
  * family to 25 opaque analysis errors because `events.ts` silently moved
  * from parquet TIMESTAMP(NANOS) to timestamp[us]. [[Bench]] and [[Verify]]
  * run this first so the next drift is one readable line, not a cascade.
  *
  * Time-typed columns accept every encoding the engine normalizes
  * ([[SparkEntry]]'s `events()` accessor handles bigint / timestamp /
  * timestamp_ntz); everything else is pinned to the current fixture dtype
  * (TESTDATA.md) because the oracle's schema compare is exact.
  */
object FixtureProbe {
  private val time = Set("bigint", "timestamp", "timestamp_ntz", "date")

  private val expected: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> time, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> time),
    "events" -> Seq("event_id" -> Set("bigint"), "ts" -> time,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** One line per drifted/missing/extra column; empty = fixtures match. */
  def drift(spark: SparkSession, sfDir: String): Seq[String] =
    expected.flatMap { case (table, cols) =>
      try {
        val actual = spark.read.parquet(s"$sfDir/$table.parquet").schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        val missing = cols.collect {
          case (c, _) if !actual.contains(c) => s"$table.$c: MISSING"
        }
        val wrong = cols.collect {
          case (c, ok) if actual.contains(c) && !ok(actual(c)) =>
            s"$table.$c: got ${actual(c)}, expected one of ${ok.mkString("|")}"
        }
        val extra = (actual.keySet -- cols.map(_._1)).toSeq.sorted
          .map(c => s"$table.$c: UNEXPECTED column (${actual(c)})")
        missing ++ wrong ++ extra
      } catch {
        case e: Throwable => Seq(s"$table: unreadable (${e.getMessage})")
      }
    }

  /** Print drift to stderr; returns true when fixtures are clean. */
  def check(spark: SparkSession, sfDir: String): Boolean = {
    val d = drift(spark, sfDir)
    d.foreach(l => System.err.println(s"[fixture-drift] $l"))
    d.isEmpty
  }
}
