package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicLong

import graft.sources.SocketBus

/** The [[StreamSoak]] resume-under-load soak, run through the REAL TCP
  * bus topology instead of the in-JVM singleton (r11 verdict #9 / r12
  * verdict #7): four JVMs — this orchestrator, the
  * [[graft.sources.BusServiceMain]] daemon (the only stateful
  * survivor), and two successive [[PipelineWorker]] drivers, the first
  * of which is KILLED -9 mid-stream while a paced feeder keeps
  * publishing at the sf1 feed rate over the socket (batched publishes,
  * the measured ~35k msgs/s transport envelope). The second worker
  * resumes from the same checkpoint against the same daemon; a final
  * availableNow drain bounds the tail.
  *
  * Pass criterion is EXACT end-to-end across the process death: the
  * output subscription holds precisely ONE copy of each fed message id
  * (idempotent publish keys absorb the replayed tail of the killed
  * worker) and the input subscription is acked to its end offset.
  *
  * Prints one JSON line and writes `docs/STREAMSOAK_TCP.json`
  * (override: SPARK_GRAFT_STREAMSOAK_TCP). Knobs: SPARK_GRAFT_SOAK_N,
  * SPARK_GRAFT_SOAK_RATE, SPARK_GRAFT_SOAK_BATCH.
  */
object StreamSoakTcp {

  private def javaBin: String =
    System.getProperty("java.home") + java.io.File.separator + "bin" +
      java.io.File.separator + "java"

  private val addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def launch(mainClass: String, args: Seq[String],
                     handshakePrefix: String,
                     jvmArgs: Seq[String]): (Process, String) = {
    val cp = System.getProperty("java.class.path")
    val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, mainClass) ++ args).toList
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    val proc = pb.start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    val deadline = System.currentTimeMillis + 180000
    var line: String = null
    while (line == null && System.currentTimeMillis < deadline) {
      if (reader.ready()) {
        val l = reader.readLine()
        if (l != null && l.startsWith(handshakePrefix)) line = l
      } else if (!proc.isAlive)
        throw new IllegalStateException(s"$mainClass died before handshake")
      else Thread.sleep(20)
    }
    require(line != null, s"$mainClass: no handshake")
    val drainer = new Thread(() => {
      try { while (reader.readLine() != null) () } catch { case _: Throwable => () }
    }, "soak-proc-drain")
    drainer.setDaemon(true); drainer.start()
    (proc, line)
  }

  private def startWorker(args: Map[String, String]): Process =
    launch("graft.streaming.PipelineWorker",
      args.map { case (k, v) => s"$k=$v" }.toSeq, "WORKER_STARTED",
      addOpens ++ Seq("-Xmx4g", "-Dspark.ui.enabled=false"))._1

  def main(cmdArgs: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SOAK_N", "600000").toInt
    val rate = sys.env.getOrElse("SPARK_GRAFT_SOAK_RATE", "50000").toInt
    val batch = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCH", "1000").toInt

    val (daemon, portLine) =
      launch("graft.sources.BusServiceMain", Seq("0"), "BUS_PORT=", Seq("-Xmx512m"))
    val port = portLine.stripPrefix("BUS_PORT=").trim.toInt
    val bus = new SocketBus("127.0.0.1", port)
    bus.ping()
    try {
      val id = java.util.UUID.randomUUID().toString.take(8)
      val (inTopic, inSub) = (s"soaktcp-in-$id", s"soaktcp-insub-$id")
      val (outTopic, outSub) = (s"soaktcp-out-$id", s"soaktcp-outsub-$id")
      bus.createTopic(inTopic); bus.createSubscription(inTopic, inSub)
      bus.createTopic(outTopic); bus.createSubscription(outTopic, outSub)
      val ckpt = Files.createTempDirectory("soaktcp-ckpt").toString

      // paced feeder over the socket: `batch` msgs per publishBatch,
      // spaced to `rate` msgs/s overall, running through the kill
      val fed = new AtomicLong(0)
      val feeder = new Thread(() => {
        var i = 0L
        while (i < n) {
          val m = math.min(batch.toLong, n - i)
          val t0 = System.nanoTime()
          bus.publishBatch(inTopic, (i until i + m).map(k =>
            s"""{"data":"$k"}""".getBytes(UTF_8)))
          fed.addAndGet(m); i += m
          val budget = (m * 1e9 / rate).toLong
          val spent = System.nanoTime() - t0
          if (spent < budget)
            java.util.concurrent.locks.LockSupport.parkNanos(budget - spent)
        }
      }, "soaktcp-feeder")

      val t0 = System.nanoTime()
      feeder.start()
      val spec = s"socket://127.0.0.1:$port"
      val workerArgs = Map("bus" -> spec, "sub" -> inSub, "out" -> outTopic,
        "checkpoint" -> ckpt, "bulkLimit" -> "20000", "idempotent" -> "true",
        "readPartitions" -> "4")

      // phase 1: continuous worker, SIGKILLed mid-stream
      val workerA = startWorker(workerArgs + ("mode" -> "run"))
      var committed = 0L
      val deadline = System.currentTimeMillis + 180000
      while (committed == 0 && System.currentTimeMillis < deadline) {
        Thread.sleep(100); committed = bus.committedOffset(inSub)
      }
      require(committed > 0, "worker A never acked a batch")
      workerA.destroyForcibly() // kill -9: no shutdown hook, no final ack
      require(workerA.waitFor(15, TimeUnit.SECONDS), "worker A did not die")
      val committedAtKill = bus.committedOffset(inSub)

      // phase 2: resume from the same checkpoint, run until the feeder
      // is done and the log is fully acked, then stop gracefully
      val workerB = startWorker(workerArgs + ("mode" -> "run"))
      feeder.join()
      val end = bus.endOffset(inSub)
      val drainDeadline = System.currentTimeMillis + 300000
      while (bus.committedOffset(inSub) < end &&
        System.currentTimeMillis < drainDeadline) Thread.sleep(200)
      workerB.destroy() // SIGTERM: withShutdownHook stops between batches
      workerB.waitFor(60, TimeUnit.SECONDS)

      // final bounded drain (a no-op if B fully caught up)
      val workerC = startWorker(workerArgs + ("mode" -> "drain"))
      require(workerC.waitFor(300, TimeUnit.SECONDS), "drain worker timed out")
      require(workerC.exitValue() == 0, s"drain exited ${workerC.exitValue()}")
      val secs = (System.nanoTime() - t0) / 1e9

      val outs = bus.payloads(outSub)
      val idRe = """"data":"(\d+)"""".r
      val ids = outs.flatMap(b =>
        idRe.findFirstMatchIn(new String(b, UTF_8)).map(_.group(1).toLong))
      val distinct = ids.toSet
      val acked = bus.committedOffset(inSub)
      val endFinal = bus.endOffset(inSub)
      val dupes = outs.size - distinct.size
      val missing = n - distinct.size
      require(outs.size == n && distinct.size == n &&
        (0L until n.toLong).forall(distinct),
        s"exactly-once violated across kill -9: $n fed, ${outs.size} out " +
          s"($dupes duplicate, $missing missing)")
      require(acked == endFinal, s"unacked backlog: $acked of $endFinal")

      val json =
        s"""{
           |  "metric": "stream_resume_soak_tcp",
           |  "bus": "socket",
           |  "messages": $n,
           |  "feed_rate_msgs_per_sec": $rate,
           |  "kill9_mid_stream": 1,
           |  "committed_at_kill": $committedAtKill,
           |  "elapsed_sec": ${f"$secs%.2f"},
           |  "effective_msgs_per_sec": ${(n / secs).round},
           |  "duplicates": $dupes,
           |  "missing": $missing,
           |  "acked_to_end": ${acked == endFinal}
           |}
           |""".stripMargin
      val path = sys.env.getOrElse("SPARK_GRAFT_STREAMSOAK_TCP",
        "/root/repo/docs/STREAMSOAK_TCP.json")
      Files.writeString(java.nio.file.Paths.get(path), json)
      println(json.linesIterator.mkString(" "))
    } finally {
      daemon.destroyForcibly()
      daemon.waitFor(10, TimeUnit.SECONDS)
    }
  }
}
