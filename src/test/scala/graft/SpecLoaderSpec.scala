package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{CreateNode, CreateRelation, HcpIntegration, SpecLoader}

/** The declarative JSON spec (src/test/resources/hcp_packer_spec.json —
  * the 9 reference templates transcribed as data) must load into
  * FunctionSpecs whose output is EXACTLY the compiled
  * [[HcpIntegration.spec]]'s: same function names/kinds in the same
  * dependency order, byte-identical schemas, identical rows. */
class SpecLoaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def loaded = SpecLoader.fromJsonFile(
    getClass.getResource("/hcp_packer_spec.json").getPath,
    s => HcpFixture.doc(s))

  private def compiled = HcpIntegration.spec("hcp", s => HcpFixture.doc(s))

  test("9 functions load with the compiled catalog's names, kinds, order") {
    val l = loaded
    val c = compiled
    assert(l.functions.map(_.name) === c.functions.map(_.name))
    assert(l.functions.map(_.kind) === c.functions.map(_.kind))
    // sanity on the kind payloads themselves
    assert(l.functions.head.kind === CreateNode("bucket"))
    assert(l.functions.last.kind ===
      CreateRelation("creates", "version", "packer_build"))
  }

  test("every loaded transform matches its compiled twin exactly") {
    val doc = HcpFixture.doc(spark)
    loaded.functions.zip(compiled.functions).foreach { case (l, c) =>
      val got = l.transform(doc)
      val want = c.transform(doc)
      assert(got.schema === want.schema,
        s"${l.name}: schema drifted\n got ${got.schema}\nwant ${want.schema}")
      val gotRows = got.collect().map(_.toSeq).toSeq
      val wantRows = want.collect().map(_.toSeq).toSeq
      assert(gotRows.sortBy(_.mkString("|")) ===
        wantRows.sortBy(_.mkString("|")), s"${l.name}: rows drifted")
    }
  }

  test("loader fails loudly on malformed specs") {
    intercept[Exception] {
      SpecLoader.fromJson("""{"name":"x","functions":[
        {"name":"f","kind":"node","label":"l",
         "steps":[{"op":"nope"}]}]}""", s => HcpFixture.doc(s))
    }
    intercept[Exception] {
      SpecLoader.fromJson("""{"name":"x","functions":[
        {"name":"f","kind":"mystery","steps":[]}]}""",
        s => HcpFixture.doc(s))
    }
    intercept[Exception] { // project with non-string field expr
      SpecLoader.fromJson("""{"name":"x","functions":[
        {"name":"f","kind":"node","label":"l",
         "steps":[{"op":"project","fields":{"a":7}}]}]}""",
        s => HcpFixture.doc(s))
    }
  }

  test("golden flow from the data file: counts match the compiled run") {
    val root = java.nio.file.Files.createTempDirectory("graft-dsl").toString
    val store = new graft.state.SnapshotStore(spark, s"$root/state")
    val sink = new graft.sink.GraphSink(spark, s"$root/graph")
    val driver = new graft.pipeline.SyncDriver(spark, store, sink)
    val r1 = driver.run(loaded)
    assert(r1("buckets") === ((2L, 0L)))
    assert(r1("orgs") === ((1L, 0L)))
    assert(r1("packer_build") === ((3L, 0L)))
    assert(sink.readEdges("creates__version__packer_build").count() === 3)
    // idempotent re-run, exactly like the compiled golden flow
    val r2 = driver.run(loaded)
    Seq("buckets", "orgs", "projects", "version", "packer_build")
      .foreach(fn => assert(r2(fn) === ((0L, 0L)), s"fn=$fn not a no-op"))
  }

  test("the empty document flows through every loaded function") {
    val empty = HcpFixture.doc(spark, HcpFixture.emptyJson)
    loaded.functions.foreach { f =>
      assert(f.transform(empty).count() === 0L, f.name)
    }
  }
}
