package graft.sink

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** A from-scratch client for the Bolt wire protocol (the public protocol
  * spoken by Neo4j's official drivers — version handshake, PackStream 2
  * serialization, chunked message framing, the HELLO/BEGIN/RUN/PULL/
  * COMMIT/ROLLBACK/GOODBYE message vocabulary of Bolt 4.x). This is the
  * production shape of the [[GraphTx]] seam: the reference connects with
  * the official Go driver (reference `internal/store/neo4j.go:29-46`,
  * `neo4j.ProviderNeo4j`); this engine ships no third-party driver jar
  * (zero-egress build), so the protocol itself is implemented here from
  * its public specification.
  *
  * Scope: exactly what [[GraphDbWriter]] needs — autocommit-free explicit
  * transactions carrying `UNWIND $list` statements whose results are
  * summaries (no graph-typed values flow back; RECORD values are decoded
  * generically and discarded by the writer). Values serialized: null,
  * booleans, integers, floats, strings, lists, maps — the complete domain
  * of template-emitted properties (SURVEY §1.2: all strings, plus the
  * engine's numeric columns).
  *
  * Protocol-accuracy is pinned by `BoltSinkSpec`, whose in-process stub
  * server independently implements the SERVER side (decode-side PackStream,
  * chunk reassembly, handshake) and fails on any malformed frame.
  */
object Bolt {

  // ---- message signatures (Bolt 4.x) ----
  final val MsgHello: Byte = 0x01
  final val MsgGoodbye: Byte = 0x02
  final val MsgReset: Byte = 0x0F
  final val MsgRun: Byte = 0x10
  final val MsgBegin: Byte = 0x11
  final val MsgCommit: Byte = 0x12
  final val MsgRollback: Byte = 0x13
  final val MsgPull: Byte = 0x3F
  final val MsgSuccess: Byte = 0x70
  final val MsgRecord: Byte = 0x71
  final val MsgIgnored: Byte = 0x7E
  final val MsgFailure: Byte = 0x7F

  /** A decoded PackStream structure: signature + field values. */
  final case class Struct(signature: Byte, fields: Seq[Any])

  /** Bolt magic preamble + the one protocol version this client speaks
    * (4.4), proposed in all four handshake slots. */
  final val Magic = 0x6060B017
  final val Version44 = 0x00000404

  // ======================= PackStream encoding =======================

  /** Serialize one value into PackStream 2 (shortest-form integers and
    * length headers, per the public spec). */
  def write(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(0xC0)
    case b: Boolean => out.writeByte(if (b) 0xC3 else 0xC2)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case s: Short => writeLong(out, s.toLong)
    case b: Byte => writeLong(out, b.toLong)
    case d: Double => out.writeByte(0xC1); out.writeDouble(d)
    case f: Float => out.writeByte(0xC1); out.writeDouble(f.toDouble)
    case s: String => writeString(out, s)
    case m: scala.collection.Map[_, _] =>
      writeMapHeader(out, m.size)
      m.foreach { case (k, mv) => writeString(out, String.valueOf(k)); write(out, mv) }
    case xs: Seq[_] =>
      writeListHeader(out, xs.size)
      xs.foreach(write(out, _))
    case Struct(sig, fields) =>
      require(fields.size < 16, "bolt structs carry at most 15 fields")
      out.writeByte(0xB0 | fields.size)
      out.writeByte(sig)
      fields.foreach(write(out, _))
    case other => writeString(out, String.valueOf(other))
  }

  private def writeLong(out: DataOutputStream, l: Long): Unit = {
    if (l >= -16 && l <= 127) out.writeByte(l.toInt)
    else if (l >= Byte.MinValue && l <= Byte.MaxValue) {
      out.writeByte(0xC8); out.writeByte(l.toInt)
    } else if (l >= Short.MinValue && l <= Short.MaxValue) {
      out.writeByte(0xC9); out.writeShort(l.toInt)
    } else if (l >= Int.MinValue && l <= Int.MaxValue) {
      out.writeByte(0xCA); out.writeInt(l.toInt)
    } else { out.writeByte(0xCB); out.writeLong(l) }
  }

  private def writeString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    if (b.length < 16) out.writeByte(0x80 | b.length)
    else if (b.length < 256) { out.writeByte(0xD0); out.writeByte(b.length) }
    else if (b.length < 65536) { out.writeByte(0xD1); out.writeShort(b.length) }
    else { out.writeByte(0xD2); out.writeInt(b.length) }
    out.write(b)
  }

  private def writeListHeader(out: DataOutputStream, n: Int): Unit = {
    if (n < 16) out.writeByte(0x90 | n)
    else if (n < 256) { out.writeByte(0xD4); out.writeByte(n) }
    else if (n < 65536) { out.writeByte(0xD5); out.writeShort(n) }
    else { out.writeByte(0xD6); out.writeInt(n) }
  }

  private def writeMapHeader(out: DataOutputStream, n: Int): Unit = {
    if (n < 16) out.writeByte(0xA0 | n)
    else if (n < 256) { out.writeByte(0xD8); out.writeByte(n) }
    else if (n < 65536) { out.writeByte(0xD9); out.writeShort(n) }
    else { out.writeByte(0xDA); out.writeInt(n) }
  }

  // ======================= PackStream decoding =======================

  /** Decode one PackStream value. Integers come back as Long, maps as
    * Map[String, Any], structs as [[Struct]]. */
  def read(in: DataInputStream): Any = {
    val marker = in.readUnsignedByte()
    marker match {
      case 0xC0 => null
      case 0xC2 => false
      case 0xC3 => true
      case 0xC1 => in.readDouble()
      case 0xC8 => in.readByte().toLong
      case 0xC9 => in.readShort().toLong
      case 0xCA => in.readInt().toLong
      case 0xCB => in.readLong()
      case 0xD0 => readString(in, in.readUnsignedByte())
      case 0xD1 => readString(in, in.readUnsignedShort())
      case 0xD2 => readString(in, in.readInt())
      case 0xD4 => readList(in, in.readUnsignedByte())
      case 0xD5 => readList(in, in.readUnsignedShort())
      case 0xD6 => readList(in, in.readInt())
      case 0xD8 => readMap(in, in.readUnsignedByte())
      case 0xD9 => readMap(in, in.readUnsignedShort())
      case 0xDA => readMap(in, in.readInt())
      case m if (m & 0xF0) == 0x80 => readString(in, m & 0x0F)
      case m if (m & 0xF0) == 0x90 => readList(in, m & 0x0F)
      case m if (m & 0xF0) == 0xA0 => readMap(in, m & 0x0F)
      case m if (m & 0xF0) == 0xB0 =>
        val n = m & 0x0F
        val sig = in.readByte()
        Struct(sig, (0 until n).map(_ => read(in)))
      case m if m >= 0xF0 => (m - 256).toLong // negative tiny int
      case m if m < 0x80 => m.toLong // positive tiny int
      case m => throw new IOException(f"packstream: unsupported marker 0x$m%02X")
    }
  }

  private def readString(in: DataInputStream, n: Int): String = {
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }
  private def readList(in: DataInputStream, n: Int): Seq[Any] =
    (0 until n).map(_ => read(in))
  private def readMap(in: DataInputStream, n: Int): Map[String, Any] =
    (0 until n).map { _ =>
      String.valueOf(read(in)) -> read(in)
    }.toMap

  // ======================= chunked framing =======================

  /** One message = its PackStream bytes split into (size16, bytes) chunks,
    * terminated by a zero-size chunk. */
  def writeMessage(out: DataOutputStream, msg: Struct): Unit = {
    val buf = new java.io.ByteArrayOutputStream()
    write(new DataOutputStream(buf), msg)
    val bytes = buf.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(bytes.length - off, 0xFFFF)
      out.writeShort(n)
      out.write(bytes, off, n)
      off += n
    }
    out.writeShort(0)
    out.flush()
  }

  /** Reassemble one chunked message and decode it. A zero-size chunk
    * before any data is a NOOP keep-alive (skipped); after data it is the
    * message terminator. Returns null on a clean EOF between messages
    * (peer closed). */
  def readMessage(in: DataInputStream): Struct = {
    val buf = new java.io.ByteArrayOutputStream()
    while (true) {
      val size =
        try in.readUnsignedShort()
        catch { case _: EOFException if buf.size() == 0 => return null }
      if (size == 0) {
        if (buf.size() > 0)
          return read(new DataInputStream(
            new java.io.ByteArrayInputStream(buf.toByteArray)))
            .asInstanceOf[Struct]
        // else NOOP keep-alive between messages — keep reading
      } else {
        val b = new Array[Byte](size)
        in.readFully(b)
        buf.write(b)
      }
    }
    throw new IOException("bolt: unreachable framing state")
  }
}

/** [[GraphTxFactory]] speaking Bolt over a plain socket: each `begin()`
  * opens a connection (handshake → HELLO → BEGIN) and returns a
  * [[GraphTx]] whose statements run inside that explicit transaction.
  * Holds only connection CONFIG (host/port/auth) — serializable into
  * `foreachPartition` closures; sockets open lazily on the executor,
  * exactly the discipline [[GraphTxFactory]] documents. */
class BoltTxFactory(host: String, port: Int, user: String, password: String,
    connectTimeoutMillis: Int = 10000, readTimeoutMillis: Int = 60000)
  extends GraphTxFactory {

  import Bolt._

  override def begin(): GraphTx = new GraphTx {
    private val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), connectTimeoutMillis)
    socket.setSoTimeout(readTimeoutMillis)
    socket.setTcpNoDelay(true)
    private val out = new DataOutputStream(
      new java.io.BufferedOutputStream(socket.getOutputStream))
    private val in = new DataInputStream(
      new java.io.BufferedInputStream(socket.getInputStream))
    private var closed = false

    // version negotiation: magic + four proposals, server picks one
    out.writeInt(Magic)
    out.writeInt(Version44); out.writeInt(0); out.writeInt(0); out.writeInt(0)
    out.flush()
    private val chosen = in.readInt()
    if (chosen != Version44)
      throw new IOException(
        f"bolt: server proposed unsupported version 0x$chosen%08X")

    expectSuccess(send(Struct(MsgHello, Seq(Map(
      "user_agent" -> "graft-bolt/0.1",
      "scheme" -> "basic",
      "principal" -> user,
      "credentials" -> password)))), "HELLO")
    expectSuccess(send(Struct(MsgBegin, Seq(Map.empty[String, Any]))), "BEGIN")

    private def send(msg: Struct): Struct = {
      writeMessage(out, msg)
      var reply = readMessage(in)
      // RECORD frames may precede the summary; the writer discards them
      while (reply != null && reply.signature == MsgRecord)
        reply = readMessage(in)
      if (reply == null) throw new EOFException("bolt: connection closed")
      reply
    }

    private def expectSuccess(reply: Struct, what: String): Unit =
      reply.signature match {
        case MsgSuccess => ()
        case MsgFailure =>
          val meta = reply.fields.headOption match {
            case Some(m: Map[_, _]) => m.map { case (k, v) => s"$k=$v" }.mkString(", ")
            case _ => ""
          }
          closeQuietly()
          throw new IOException(s"bolt: $what failed: $meta")
        case other =>
          closeQuietly()
          throw new IOException(f"bolt: $what got unexpected 0x$other%02X")
      }

    override def run(cypher: String, list: Seq[Map[String, Any]]): Unit = {
      expectSuccess(send(Struct(MsgRun,
        Seq(cypher, Map("list" -> list), Map.empty[String, Any]))), "RUN")
      expectSuccess(send(Struct(MsgPull, Seq(Map("n" -> -1L)))), "PULL")
    }

    override def commit(): Unit = {
      expectSuccess(send(Struct(MsgCommit, Seq.empty)), "COMMIT")
      goodbye()
    }

    override def rollback(): Unit = {
      if (!closed) {
        expectSuccess(send(Struct(MsgRollback, Seq.empty)), "ROLLBACK")
        goodbye()
      }
    }

    private def goodbye(): Unit = {
      try writeMessage(out, Struct(MsgGoodbye, Seq.empty))
      catch { case _: IOException => }
      closeQuietly()
    }

    private def closeQuietly(): Unit = {
      closed = true
      try socket.close() catch { case _: IOException => }
    }
  }
}
