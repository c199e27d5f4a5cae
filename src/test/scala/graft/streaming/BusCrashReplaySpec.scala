package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SocketBus

/** Redelivery across PROCESS DEATH, and the pipeline under
  * `local-cluster` with the bus in its own process (r8 verdict #1's
  * "done" bar). Three+ JVMs per test: this orchestrator, the
  * [[graft.sources.BusServiceMain]] daemon, the
  * [[PipelineWorker]] driver — and under local-cluster, two executor
  * JVMs beyond that, each resolving its own SocketBus from the spec
  * string carried by the input partitions.
  *
  * No Spark session in THIS JVM: everything is asserted through the
  * daemon, which is the only stateful survivor — exactly the reference's
  * `test_client.py` topology.
  */
class BusCrashReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var daemon: Process = _
  private var port: Int = 0
  private var bus: SocketBus = _
  private def spec = s"socket://127.0.0.1:$port"

  override def beforeAll(): Unit = {
    val (p, bound) = ProcSupport.startDaemon()
    daemon = p
    port = bound
    bus = new SocketBus("127.0.0.1", port)
    bus.ping()
  }

  override def afterAll(): Unit =
    if (daemon != null) ProcSupport.stop(daemon)

  private def fresh(prefix: String): (String, String, String, String) = {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val inTopic = s"$prefix-in-$id"; val inSub = s"$prefix-insub-$id"
    val outTopic = s"$prefix-out-$id"; val outSub = s"$prefix-outsub-$id"
    bus.createTopic(inTopic)
    bus.createSubscription(inTopic, inSub)
    bus.createTopic(outTopic)
    bus.createSubscription(outTopic, outSub)
    (inTopic, inSub, outTopic, outSub)
  }

  private def awaitCommitted(sub: String, pred: Long => Boolean,
                             timeoutMs: Long): Long = {
    val deadline = System.currentTimeMillis + timeoutMs
    var c = bus.committedOffset(sub)
    while (System.currentTimeMillis < deadline && !pred(c)) {
      Thread.sleep(100)
      c = bus.committedOffset(sub)
    }
    c
  }

  test("kill -9 mid-run: unacked messages redeliver; idempotent keys absorb replays") {
    val n = 40
    val (inTopic, inSub, outTopic, outSub) = fresh("crash")
    (1 to n).foreach(i =>
      bus.publish(inTopic, s"""{"data":"m-$i"}""".getBytes(UTF_8)))
    val ckpt = Files.createTempDirectory("graft-crash").toString

    // phase 1: slow worker (50ms/row, 5 msgs/batch), killed mid-flight
    val workerA = ProcSupport.startWorker(Map(
      "bus" -> spec, "sub" -> inSub, "out" -> outTopic,
      "checkpoint" -> ckpt, "mode" -> "run",
      "sleepMs" -> "50", "bulkLimit" -> "5", "idempotent" -> "true"))
    val mid = awaitCommitted(inSub, c => c > 0, timeoutMs = 120000)
    assert(mid > 0, "worker A never acked a batch")
    workerA.destroyForcibly() // SIGKILL: no shutdown hook, no final ack
    assert(workerA.waitFor(15, TimeUnit.SECONDS), "worker A did not die")
    val committedAfterKill = bus.committedOffset(inSub)
    assert(committedAfterKill < n,
      s"kill landed too late to leave unacked messages ($committedAfterKill/$n) " +
        "— raise n or sleepMs if this flakes")
    val publishedByA = bus.payloads(outSub).size

    // phase 2: fresh process, same checkpoint — drains the remainder.
    // The unacked suffix [committedAfterKill, n) MUST redeliver; any
    // replayed tail batch of A re-publishes under the same
    // (pipelineId, batchId, slot) keys and the daemon absorbs it.
    val workerB = ProcSupport.startWorker(Map(
      "bus" -> spec, "sub" -> inSub, "out" -> outTopic,
      "checkpoint" -> ckpt, "mode" -> "drain", "bulkLimit" -> "5",
      "idempotent" -> "true"))
    assert(workerB.waitFor(240, TimeUnit.SECONDS), "worker B did not finish draining")
    assert(workerB.exitValue() == 0, s"worker B exited ${workerB.exitValue()}")

    assert(awaitCommitted(inSub, _ == n, timeoutMs = 30000) == n,
      "drain did not ack the full log")
    val out = bus.payloads(outSub).map(new String(_, UTF_8)).sorted
    // no loss AND no duplicates: exactly the n distinct payloads
    assert(out == (1 to n).map(i => s"""{"data":"m-$i"}""").sorted,
      s"crash-replay lost or duplicated messages: A published $publishedByA, " +
        s"total ${out.size}, committed-at-kill $committedAfterKill")
  }

  test("pipeline green under local-cluster[2,4,2048] with the bus in its own process") {
    val n = 12
    val (inTopic, inSub, outTopic, outSub) = fresh("lc")
    (1 to n).foreach(i =>
      bus.publish(inTopic, s"""{"data":"lc-$i"}""".getBytes(UTF_8)))
    val worker = ProcSupport.startWorker(Map(
      "bus" -> spec, "sub" -> inSub, "out" -> outTopic,
      "checkpoint" -> Files.createTempDirectory("graft-lc").toString,
      "mode" -> "drain", "bulkLimit" -> "6", "readPartitions" -> "4",
      "master" -> "local-cluster[2,4,2048]",
      "execCp" -> ProcSupport.classpath),
      xmx = "2g", timeoutMs = 300000)
    assert(worker.waitFor(300, TimeUnit.SECONDS), "local-cluster worker timed out")
    assert(worker.exitValue() == 0, s"worker exited ${worker.exitValue()}")
    val out = bus.payloads(outSub).map(new String(_, UTF_8)).sorted
    assert(out == (1 to n).map(i => s"""{"data":"lc-$i"}""").sorted)
    assert(bus.committedOffset(inSub) == n,
      "executor JVMs published but the ack-on-commit never landed in the daemon")
  }
}
