package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.{ServerSocket, Socket}

import scala.collection.mutable

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{HcpIntegration, SyncDriver}
import graft.sink.{Bolt, BoltTxFactory, GraphDbWriter, MirroredGraphSink}
import graft.state.SnapshotStore

/** In-process Bolt server: independently implements the SERVER side of the
  * protocol (handshake verification, chunk reassembly, PackStream decode,
  * explicit-transaction message flow) and applies committed statements to
  * [[FakeGraphDb]]. Any framing or serialization defect in the client
  * surfaces here as a hard failure, not a lenient skip. Transaction
  * semantics mirror a real server: RUN/PULL stage statements, COMMIT
  * applies them atomically, ROLLBACK discards. */
class StubBoltServer(dbName: String, user: String, password: String) {
  import Bolt._

  private val server = new ServerSocket(0, 50,
    java.net.InetAddress.getByName("127.0.0.1"))
  @volatile private var running = true
  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => handle(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: IOException => /* closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  private def success(out: DataOutputStream, meta: Map[String, Any]): Unit =
    writeMessage(out, Struct(MsgSuccess, Seq(meta)))
  private def failure(out: DataOutputStream, code: String, msg: String): Unit =
    writeMessage(out, Struct(MsgFailure,
      Seq(Map("code" -> code, "message" -> msg))))

  private def handle(socket: Socket): Unit = {
    val in = new DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))
    try {
      // ---- version negotiation ----
      require(in.readInt() == Magic, "bad bolt magic")
      val proposals = (1 to 4).map(_ => in.readInt())
      require(proposals.contains(Version44), s"no supported version in $proposals")
      out.writeInt(Version44); out.flush()

      val staged = mutable.Buffer[(String, Seq[Map[String, Any]])]()
      var pendingRun: Option[(String, Seq[Map[String, Any]])] = None
      var authed = false
      var open = true
      while (open) {
        val msg = readMessage(in)
        if (msg == null) { open = false }
        else msg.signature match {
          case MsgHello =>
            val meta = msg.fields.head.asInstanceOf[Map[String, Any]]
            if (meta.get("scheme").contains("basic") &&
              meta.get("principal").contains(user) &&
              meta.get("credentials").contains(password)) {
              authed = true
              success(out, Map("server" -> "graft-stub/1.0",
                "connection_id" -> "bolt-stub-1"))
            } else {
              failure(out, "Neo.ClientError.Security.Unauthorized",
                "The client is unauthorized due to authentication failure.")
              open = false
            }
          case MsgBegin if authed => success(out, Map.empty)
          case MsgRun if authed =>
            val Seq(q, params, _) = msg.fields
            val list = params.asInstanceOf[Map[String, Any]]
              .getOrElse("list", Seq.empty).asInstanceOf[Seq[Any]]
              .map(_.asInstanceOf[Map[String, Any]])
            pendingRun = Some((q.asInstanceOf[String], list))
            success(out, Map("fields" -> Seq.empty))
          case MsgPull if authed =>
            pendingRun match {
              case Some(stmt) =>
                staged += stmt; pendingRun = None
                success(out, Map("has_more" -> false))
              case None =>
                failure(out, "Neo.ClientError.Request.Invalid",
                  "PULL without a pending RUN")
                open = false
            }
          case MsgCommit if authed =>
            val db = FakeGraphDb(dbName)
            try {
              db.synchronized {
                staged.foreach { case (c, l) => db.applyStmt(c, l) }
              }
              staged.clear()
              success(out, Map("bookmark" -> s"bm-${db.batches.size}"))
            } catch {
              case e: Exception =>
                failure(out, "Neo.ClientError.Statement.SyntaxError",
                  String.valueOf(e.getMessage))
                open = false
            }
          case MsgRollback if authed =>
            staged.clear(); success(out, Map.empty)
          case MsgReset => staged.clear(); success(out, Map.empty)
          case MsgGoodbye => open = false
          case other =>
            failure(out, "Neo.ClientError.Request.Invalid",
              f"unexpected message 0x${other}%02X")
            open = false
        }
        out.flush()
      }
    } catch { case _: IOException => /* client went away */ }
    finally { try socket.close() catch { case _: IOException => } }
  }
}

class BoltSinkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = SparkTestBase.spark

  private var server: StubBoltServer = _

  override def beforeAll(): Unit = {
    FakeGraphDb.drop("bolt")
    server = new StubBoltServer("bolt", "neo4j", "s3cret")
  }
  override def afterAll(): Unit = if (server != null) server.stop()

  private def roundTrip(v: Any): Any = {
    val buf = new ByteArrayOutputStream()
    Bolt.write(new DataOutputStream(buf), v)
    Bolt.read(new DataInputStream(new ByteArrayInputStream(buf.toByteArray)))
  }

  test("packstream round-trip across type and size classes") {
    assert(roundTrip(null) === null)
    assert(roundTrip(true) === true && roundTrip(false) === false)
    // integer size classes: tiny, int8, int16, int32, int64 boundaries
    for (l <- Seq(0L, 1L, -1L, -16L, -17L, 127L, 128L, -128L, -129L,
      32767L, 32768L, -32768L, -32769L, Int.MaxValue.toLong,
      Int.MaxValue + 1L, Long.MaxValue, Long.MinValue))
      assert(roundTrip(l) === l, s"long $l")
    assert(roundTrip(3.25) === 3.25)
    // string size classes: tiny (<16), str8, str16
    for (n <- Seq(0, 15, 16, 255, 256, 70000))
      assert(roundTrip("x" * n) === "x" * n, s"string len $n")
    val nested = Map("a" -> 1L, "b" -> Seq("x", null, 2.5),
      "c" -> Map("d" -> false))
    assert(roundTrip(nested) === nested)
    val struct = Bolt.Struct(0x10, Seq("RETURN 1", Map("k" -> "v")))
    assert(roundTrip(struct) === struct)
  }

  test("chunked framing: >64 KiB messages split and reassemble; NOOP chunks skipped") {
    val big = Bolt.Struct(Bolt.MsgRun,
      Seq("q" * 100000, Map("list" -> Seq.empty), Map.empty))
    val buf = new ByteArrayOutputStream()
    val out = new DataOutputStream(buf)
    out.writeShort(0) // NOOP keep-alive chunk before the message
    Bolt.writeMessage(out, big)
    val raw = buf.toByteArray
    // payload (~100 KB) exceeds one max-size chunk → must have split
    assert(raw.length > 0xFFFF + 4)
    val got = Bolt.readMessage(
      new DataInputStream(new ByteArrayInputStream(raw)))
    assert(got === big)
  }

  test("full pipeline mirrors to the graph DB over the bolt wire") {
    val root = java.nio.file.Files.createTempDirectory("graft-bolt").toString
    val store = new SnapshotStore(spark, s"$root/state")
    val writer = new GraphDbWriter(
      new BoltTxFactory("127.0.0.1", server.port, "neo4j", "s3cret"),
      batchSize = 2)
    val sink = new MirroredGraphSink(spark, s"$root/graph", writer)
    val driver = new SyncDriver(spark, store, sink)
    val db = FakeGraphDb("bolt")

    driver.run(HcpIntegration.spec("bolt-e2e", s => HcpFixture.doc(s)))
    // remote (bolt-fed) node/edge sets equal the local parquet tables
    for (label <- Seq("bucket", "org", "project", "version", "packer_build")) {
      val local = sink.readNodes(label).select("external_id")
        .collect().map(_.getString(0)).toSet
      val remote = db.synchronized(
        db.nodes.keys.filter(_._1 == label).map(_._2).toSet)
      assert(remote === local, s"label=$label")
      assert(remote.nonEmpty, s"label=$label empty — nothing crossed the wire")
    }
    val localEdges = sink.readEdges("creates__version__packer_build")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val remoteEdges = db.synchronized(db.edges.collect {
      case ("creates", "version", a, "packer_build", b) => (a, b)
    }.toSet)
    assert(remoteEdges === localEdges && remoteEdges.size === 3)

    // delete pass flows DETACH DELETE over the wire
    driver.run(HcpIntegration.spec("bolt-e2e",
      s => HcpFixture.doc(s, HcpFixture.emptyJson)))
    assert(db.synchronized(db.nodes.isEmpty))
    assert(db.synchronized(db.edges.isEmpty))
  }

  test("bad credentials fail HELLO; server failure rolls the tx back") {
    val bad = new BoltTxFactory("127.0.0.1", server.port, "neo4j", "wrong")
    val e = intercept[IOException](bad.begin())
    assert(e.getMessage.contains("Unauthorized"))

    // an unrecognized statement fails at COMMIT with the server's code
    val tx = new BoltTxFactory("127.0.0.1", server.port, "neo4j", "s3cret")
      .begin()
    tx.run("THIS IS NOT CYPHER", Seq(Map("external_id" -> "x")))
    val ce = intercept[IOException](tx.commit())
    assert(ce.getMessage.contains("COMMIT failed"))
    // and nothing leaked into the db
    assert(FakeGraphDb("bolt").synchronized(FakeGraphDb("bolt").nodes.isEmpty))
  }
}
