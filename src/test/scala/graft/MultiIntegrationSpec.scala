package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._
import graft.sink.GraphSink
import graft.state.SnapshotStore

/** Two integrations through one driver/store/sink: state is isolated per
  * integration key (the reference's `type:url` map level, model.go:37-44),
  * even for functions with identical names. */
class MultiIntegrationSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("same function name in two integrations: independent state") {
    val root = Files.createTempDirectory("graft-multi").toString
    val store = new SnapshotStore(spark, s"$root/state")
    val driver = new SyncDriver(spark, store,
      new GraphSink(spark, s"$root/graph"))
    import graft.operators.HcpTransforms._

    def spec(name: String, body: String) = IntegrationSpec(name,
      s => HcpFixture.doc(s, body),
      Seq(FunctionSpec("buckets", CreateNode(s"bucket_$name"), bucketNodes)))

    val r1 = driver.run(spec("intA", HcpFixture.json))
    assert(r1("buckets") === ((2L, 0L)))

    // intB starts fresh even though its function is also named "buckets"
    val r2 = driver.run(spec("intB", HcpFixture.json))
    assert(r2("buckets") === ((2L, 0L)))

    // deleting everything in intB must not touch intA's state
    val r3 = driver.run(spec("intB", HcpFixture.emptyJson))
    assert(r3("buckets") === ((0L, 2L)))
    val r4 = driver.run(spec("intA", HcpFixture.json))
    assert(r4("buckets") === ((0L, 0L)), "intA state was disturbed by intB")
  }
}
