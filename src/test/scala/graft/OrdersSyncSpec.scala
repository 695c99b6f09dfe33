package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline._
import graft.sink.GraphSink
import graft.state.SnapshotStore

/** Incremental sync over REAL data (sf0.001 orders, 1500 keys): full load,
  * no-op reload, then a mutated upstream (updates + disappearing keys) —
  * the reference's whole lifecycle at table scale rather than fixture
  * scale. */
class OrdersSyncSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val dir = "/root/testdata/sf0.001"

  private def ordersAsNodes(filterExpr: String, bumpExpr: String)
      (s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .filter(filterExpr)
      .select(col("o_orderkey").cast("string").as("external_id"),
        concat(date_format(col("o_orderdate"), "yyyy-MM-dd"),
          expr(bumpExpr)).as("updated_at"),
        col("o_orderstatus").as("status"))

  private def spec(load: SparkSession => DataFrame) =
    IntegrationSpec("orders-sync", load, Seq(
      FunctionSpec("order_nodes", CreateNode("order"), df => df)))

  test("full load → no-op → incremental update/delete on 1500 real keys") {
    val root = Files.createTempDirectory("graft-orders").toString
    val store = new SnapshotStore(spark, s"$root/state")
    val sink = new GraphSink(spark, s"$root/graph")
    val driver = new SyncDriver(spark, store, sink)

    // pass 1: everything new
    val r1 = driver.run(spec(ordersAsNodes("true", "''")))
    assert(r1("order_nodes") === ((1500L, 0L)))
    assert(sink.readNodes("order").count() === 1500)
    assert(driver.lastRunMetrics.contains("order_nodes"))

    // pass 2: identical → empty delta (convergence of the real table)
    val r2 = driver.run(spec(ordersAsNodes("true", "''")))
    assert(r2("order_nodes") === ((0L, 0L)))

    // pass 3: keys %11==0 vanish upstream; %7==0 get a bumped timestamp
    val r3 = driver.run(spec(ordersAsNodes("o_orderkey % 11 != 0",
      "CASE WHEN o_orderkey % 7 = 0 THEN '+bump' ELSE '' END")))
    val expDeleted = 1500 / 11 + 1 // keys 0,11,...  (0 counts: 0%11==0)
    val expChanged = spark.read.parquet(s"$dir/orders.parquet")
      .filter("o_orderkey % 11 != 0 AND o_orderkey % 7 = 0").count()
    assert(r3("order_nodes") === ((expChanged, expDeleted.toLong)))
    assert(sink.readNodes("order").count() === 1500 - expDeleted)
    // changed rows were replaced wholesale (K1): bumped token visible
    val bumped = sink.readNodes("order")
      .filter(col("updated_at").endsWith("+bump")).count()
    assert(bumped === expChanged)
  }
}
