package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.{InetAddress, ServerSocket, Socket}

/** Cross-process bus daemon (round-8 verdict #1): a TCP server hosting a
  * private [[BusCore]], so the DSv2 connector, the pipelines, and the
  * test client talk to a bus in a genuinely separate process — the shape
  * of the reference's own cross-process harness (`test_client.py:6-31`).
  * Spark-free: the daemon runs on a bare JVM with the library classes
  * and the Scala runtime only (see [[BusServiceMain]]).
  *
  * Protocol: length-free framed binary over `DataInput/OutputStream` —
  * request = op name (UTF) + op-specific fields; response = status int
  * (0 ok; 1/2/3 the three typed bus errors; 4 anything else) + fields.
  * The typed errors cross the wire and are RE-THROWN as the same classes
  * by [[SocketBus]], so the connector's retry/backoff logic
  * (`pubsub_pipeline.py:204-211` semantics) is transport-agnostic. One
  * connection serves many requests (loop until EOF); the client may
  * equally open one per call.
  *
  * Binding is localhost-only: this is a test/benchmark daemon, not a
  * hardened network service.
  */
final class BusService(port: Int = 0) {
  private val core = new BusCore
  private var server: ServerSocket = _
  @volatile private var running = false

  /** Start accepting; returns the actual bound port (0 = ephemeral). */
  def start(): Int = synchronized {
    require(server == null, "already started")
    server = new ServerSocket(port, 64, InetAddress.getLoopbackAddress)
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock), "bus-conn")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: Throwable if !running => // closed during shutdown
          case e: Throwable =>
            System.err.println(s"[bus-service] accept failed: ${e.getMessage}")
        }
      }
    }, "bus-accept")
    acceptor.setDaemon(true)
    acceptor.start()
    server.getLocalPort
  }

  def stop(): Unit = synchronized {
    running = false
    if (server != null) { try server.close() catch { case _: Throwable => () } }
  }

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
    val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
    try {
      while (true) {
        val op = in.readUTF()
        try {
          handle(op, in, out)
        } catch {
          case e: InMemoryBus.TransientPullError => err(out, 1, e.getMessage)
          case e: InMemoryBus.AckRpcError => err(out, 2, e.getMessage)
          case e: InMemoryBus.PublishError => err(out, 3, e.getMessage)
          case e: Throwable => err(out, 4, String.valueOf(e.getMessage))
        }
        out.flush()
      }
    } catch {
      case _: EOFException => // client done
      case _: java.net.SocketException => // client gone
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private def err(out: DataOutputStream, code: Int, msg: String): Unit = {
    out.writeInt(code)
    out.writeUTF(if (msg == null) "" else msg)
  }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length)
    out.write(b)
  }

  private def readAttrs(in: DataInputStream): Map[String, String] = {
    val n = in.readInt()
    (1 to n).map(_ => in.readUTF() -> in.readUTF()).toMap
  }

  private def handle(op: String, in: DataInputStream, out: DataOutputStream): Unit =
    op match {
      case "ping" =>
        out.writeInt(0)
      case "createTopic" =>
        core.createTopic(in.readUTF()); out.writeInt(0)
      case "createSub" =>
        val t = in.readUTF(); val n = in.readUTF()
        core.createSubscription(t, n); out.writeInt(0)
      case "publish" =>
        val t = in.readUTF()
        val attrs = readAttrs(in)
        val data = readBytes(in)
        val id = core.publish(t, data, attrs)
        out.writeInt(0); out.writeUTF(id)
      case "publishBatch" =>
        val t = in.readUTF()
        val n = in.readInt()
        // read the whole frame FIRST: a mid-batch PublishError must not
        // desync the stream (request fully consumed before any throw)
        val payloads = (1 to n).map(_ => readBytes(in))
        val appended = core.publishBatch(t, payloads)
        out.writeInt(0); out.writeInt(appended)
      case "publishIdemBatch" =>
        val t = in.readUTF()
        val n = in.readInt()
        val keyed = (1 to n).map(_ => (in.readUTF(), readBytes(in)))
        val appended = core.publishIdempotentBatch(t, keyed)
        out.writeInt(0); out.writeInt(appended)
      case "publishIdem" =>
        val t = in.readUTF(); val k = in.readUTF(); val data = readBytes(in)
        val appended = core.publishIdempotent(t, k, data)
        out.writeInt(0); out.writeBoolean(appended)
      case "endOffset" =>
        val v = core.endOffset(in.readUTF())
        out.writeInt(0); out.writeLong(v)
      case "committed" =>
        val v = core.committedOffset(in.readUTF())
        out.writeInt(0); out.writeLong(v)
      case "read" =>
        val s = in.readUTF(); val from = in.readLong(); val until = in.readLong()
        val msgs = core.read(s, from, until)
        out.writeInt(0)
        out.writeInt(msgs.size)
        msgs.foreach { m =>
          out.writeUTF(m.messageId)
          out.writeLong(m.publishTimeMicros)
          out.writeInt(m.attributes.size)
          m.attributes.foreach { case (k, v) => out.writeUTF(k); out.writeUTF(v) }
          writeBytes(out, m.data)
        }
      case "commit" =>
        val s = in.readUTF(); val upTo = in.readLong()
        core.commit(s, upTo); out.writeInt(0)
      case "failNextPulls" =>
        core.failNextPulls(in.readUTF(), in.readInt()); out.writeInt(0)
      case "failNextCommits" =>
        core.failNextCommits(in.readUTF(), in.readInt()); out.writeInt(0)
      case "capNextPulls" =>
        val s = in.readUTF(); val cap = in.readLong(); val times = in.readInt()
        core.capNextPulls(s, cap, times); out.writeInt(0)
      case "failNextPublishes" =>
        core.failNextPublishes(in.readUTF(), in.readInt()); out.writeInt(0)
      case "failPublishesAfter" =>
        val t = in.readUTF(); val after = in.readInt(); val n = in.readInt()
        core.failPublishesAfter(t, after, n); out.writeInt(0)
      case "rewindCommitted" =>
        val s = in.readUTF(); val to = in.readLong()
        core.rewindCommitted(s, to); out.writeInt(0)
      case "payloads" =>
        val ps = core.payloads(in.readUTF())
        out.writeInt(0)
        out.writeInt(ps.size)
        ps.foreach(writeBytes(out, _))
      case "reset" =>
        core.reset(); out.writeInt(0)
      case "nowMicros" =>
        out.writeInt(0); out.writeLong(core.nowMicros())
      case "advanceClock" =>
        core.advanceClock(in.readLong()); out.writeInt(0)
      case "acquireLease" =>
        val s = in.readUTF(); val h = in.readUTF(); val d = in.readLong()
        val ok = core.acquireLease(s, h, d)
        out.writeInt(0); out.writeBoolean(ok)
      case "modifyAckDeadline" =>
        val s = in.readUTF(); val h = in.readUTF(); val d = in.readLong()
        val ok = core.modifyAckDeadline(s, h, d)
        out.writeInt(0); out.writeBoolean(ok)
      case other =>
        err(out, 4, s"unknown op: $other")
    }
}

/** Stand-alone daemon entrypoint:
  * `java -cp <graft-classes>:<scala-library> graft.sources.BusServiceMain [port]`.
  * Prints `BUS_PORT=<port>` on stdout once listening (the launcher
  * handshake), then serves until killed. */
object BusServiceMain {
  def main(args: Array[String]): Unit = {
    val port = if (args.nonEmpty) args(0).toInt else 0
    val svc = new BusService(port)
    val bound = svc.start()
    // the launcher handshake: parseable, flushed, exactly once
    println(s"BUS_PORT=$bound")
    System.out.flush()
    // serve until the process is killed (daemon threads would otherwise
    // let the JVM exit immediately)
    new java.util.concurrent.CountDownLatch(1).await()
  }
}

/** TCP client transport for a [[BusService]] daemon — the [[Bus]] the
  * connector resolves from `bus = socket://host:port`. One connection
  * per call: stateless, so instances are free to construct on executors
  * (partitions carry the spec string), and a daemon restart between
  * calls needs no client-side reconnect logic. Bus-typed errors are
  * reconstructed from the wire status so retry contracts behave exactly
  * as against [[InMemoryBus]]. */
final class SocketBus(host: String, port: Int) extends Bus {

  private def call[A](f: (DataInputStream, DataOutputStream) => A): A = {
    val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    try {
      val in = new DataInputStream(new java.io.BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(new java.io.BufferedOutputStream(sock.getOutputStream))
      f(in, out)
    } finally {
      try sock.close() catch { case _: Throwable => () }
    }
  }

  private def expectOk(in: DataInputStream): Unit = {
    val status = in.readInt()
    if (status != 0) {
      val msg = in.readUTF()
      status match {
        case 1 => throw new InMemoryBus.TransientPullError(msg)
        case 2 => throw new InMemoryBus.AckRpcError(msg)
        case 3 => throw new InMemoryBus.PublishError(msg)
        case _ => throw new IllegalStateException(s"bus service error: $msg")
      }
    }
  }

  private def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length)
    out.write(b)
  }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt()
    val b = new Array[Byte](n)
    in.readFully(b)
    b
  }

  override def createTopic(topic: String): Unit = call { (in, out) =>
    out.writeUTF("createTopic"); out.writeUTF(topic); out.flush(); expectOk(in)
  }

  override def createSubscription(topic: String, name: String): Unit = call { (in, out) =>
    out.writeUTF("createSub"); out.writeUTF(topic); out.writeUTF(name)
    out.flush(); expectOk(in)
  }

  override def publish(topic: String, data: Array[Byte],
                       attributes: Map[String, String] = Map.empty): String =
    call { (in, out) =>
      out.writeUTF("publish"); out.writeUTF(topic)
      out.writeInt(attributes.size)
      attributes.foreach { case (k, v) => out.writeUTF(k); out.writeUTF(v) }
      writeBytes(out, data)
      out.flush(); expectOk(in)
      in.readUTF()
    }

  override def publishIdempotent(topic: String, key: String, data: Array[Byte]): Boolean =
    call { (in, out) =>
      out.writeUTF("publishIdem"); out.writeUTF(topic); out.writeUTF(key)
      writeBytes(out, data)
      out.flush(); expectOk(in)
      in.readBoolean()
    }

  override def publishBatch(topic: String, data: Seq[Array[Byte]]): Int =
    call { (in, out) =>
      out.writeUTF("publishBatch"); out.writeUTF(topic)
      out.writeInt(data.size)
      data.foreach(writeBytes(out, _))
      out.flush(); expectOk(in)
      in.readInt()
    }

  override def publishIdempotentBatch(topic: String,
                                      keyed: Seq[(String, Array[Byte])]): Int =
    call { (in, out) =>
      out.writeUTF("publishIdemBatch"); out.writeUTF(topic)
      out.writeInt(keyed.size)
      keyed.foreach { case (k, d) => out.writeUTF(k); writeBytes(out, d) }
      out.flush(); expectOk(in)
      in.readInt()
    }

  override def endOffset(name: String): Long = call { (in, out) =>
    out.writeUTF("endOffset"); out.writeUTF(name); out.flush(); expectOk(in)
    in.readLong()
  }

  override def committedOffset(name: String): Long = call { (in, out) =>
    out.writeUTF("committed"); out.writeUTF(name); out.flush(); expectOk(in)
    in.readLong()
  }

  override def read(name: String, from: Long, until: Long): Seq[InMemoryBus.BusMessage] =
    call { (in, out) =>
      out.writeUTF("read"); out.writeUTF(name)
      out.writeLong(from); out.writeLong(until)
      out.flush(); expectOk(in)
      val n = in.readInt()
      (1 to n).map { _ =>
        val id = in.readUTF()
        val ts = in.readLong()
        val na = in.readInt()
        val attrs = (1 to na).map(_ => in.readUTF() -> in.readUTF()).toMap
        val data = readBytes(in)
        InMemoryBus.BusMessage(data, id, ts, attrs)
      }
    }

  override def commit(name: String, upTo: Long): Unit = call { (in, out) =>
    out.writeUTF("commit"); out.writeUTF(name); out.writeLong(upTo)
    out.flush(); expectOk(in)
  }

  override def payloads(name: String): Seq[Array[Byte]] = call { (in, out) =>
    out.writeUTF("payloads"); out.writeUTF(name); out.flush(); expectOk(in)
    val n = in.readInt()
    (1 to n).map(_ => readBytes(in))
  }

  override def failNextPulls(name: String, n: Int): Unit = call { (in, out) =>
    out.writeUTF("failNextPulls"); out.writeUTF(name); out.writeInt(n)
    out.flush(); expectOk(in)
  }

  override def failNextCommits(name: String, n: Int): Unit = call { (in, out) =>
    out.writeUTF("failNextCommits"); out.writeUTF(name); out.writeInt(n)
    out.flush(); expectOk(in)
  }

  override def capNextPulls(name: String, maxPerPull: Long, times: Int): Unit =
    call { (in, out) =>
      out.writeUTF("capNextPulls"); out.writeUTF(name)
      out.writeLong(maxPerPull); out.writeInt(times)
      out.flush(); expectOk(in)
    }

  override def failNextPublishes(topic: String, n: Int): Unit = call { (in, out) =>
    out.writeUTF("failNextPublishes"); out.writeUTF(topic); out.writeInt(n)
    out.flush(); expectOk(in)
  }

  override def failPublishesAfter(topic: String, after: Int, n: Int): Unit =
    call { (in, out) =>
      out.writeUTF("failPublishesAfter"); out.writeUTF(topic)
      out.writeInt(after); out.writeInt(n)
      out.flush(); expectOk(in)
    }

  override def rewindCommitted(name: String, to: Long): Unit = call { (in, out) =>
    out.writeUTF("rewindCommitted"); out.writeUTF(name); out.writeLong(to)
    out.flush(); expectOk(in)
  }

  override def reset(): Unit = call { (in, out) =>
    out.writeUTF("reset"); out.flush(); expectOk(in)
  }

  override def nowMicros(): Long = call { (in, out) =>
    out.writeUTF("nowMicros"); out.flush(); expectOk(in); in.readLong()
  }

  override def advanceClock(byMicros: Long): Unit = call { (in, out) =>
    out.writeUTF("advanceClock"); out.writeLong(byMicros)
    out.flush(); expectOk(in)
  }

  override def acquireLease(name: String, holder: String,
                            deadlineMicros: Long): Boolean = call { (in, out) =>
    out.writeUTF("acquireLease"); out.writeUTF(name); out.writeUTF(holder)
    out.writeLong(deadlineMicros)
    out.flush(); expectOk(in); in.readBoolean()
  }

  override def modifyAckDeadline(name: String, holder: String,
                                 newDeadlineMicros: Long): Boolean = call { (in, out) =>
    out.writeUTF("modifyAckDeadline"); out.writeUTF(name); out.writeUTF(holder)
    out.writeLong(newDeadlineMicros)
    out.flush(); expectOk(in); in.readBoolean()
  }

  /** Liveness probe (launcher handshake helper). */
  def ping(): Unit = call { (in, out) =>
    out.writeUTF("ping"); out.flush(); expectOk(in)
  }
}
