package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.util.concurrent.TimeUnit

/** Separate-JVM process launching for the cross-process bus suites.
  *
  * The forked test JVM's `java.class.path` carries the full test
  * classpath (graft classes + test classes + Spark jars + scalatest), so
  * child processes reuse it verbatim: the bus daemon only loads the
  * Spark-free `graft.sources` slice; the pipeline worker needs all of
  * Spark plus the JDK-17 `--add-opens` set (mirrors build.sbt).
  */
object ProcSupport {

  private def javaBin: String =
    System.getProperty("java.home") + java.io.File.separator + "bin" +
      java.io.File.separator + "java"

  /** Same list as build.sbt's jdk17AddOpens (Spark 4 on JDK 17 outside
    * spark-submit). */
  val addOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  val classpath: String = System.getProperty("java.class.path")

  /** Launch a JVM and wait for a handshake line matching `prefix` on its
    * stdout; returns (process, matched line). stderr is inherited so
    * failures are visible in the test log. */
  def launch(mainClass: String, args: Seq[String], handshakePrefix: String,
             jvmArgs: Seq[String] = Seq("-Xmx512m"),
             timeoutMs: Long = 120000): (Process, String) = {
    val cmd = (Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", classpath, mainClass) ++ args).toList
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    // local-cluster executor launching resolves its command through
    // SPARK_HOME; outside a dev tree the launcher additionally needs
    // SPARK_SCALA_VERSION or it aborts with "Cannot find any build
    // directories" (AbstractCommandBuilder.getScalaVersion)
    pb.environment().putIfAbsent("SPARK_HOME", "/opt/spark")
    pb.environment().putIfAbsent("SPARK_SCALA_VERSION", "2.13")
    val proc = pb.start()
    val reader = new BufferedReader(new InputStreamReader(proc.getInputStream))
    val deadline = System.currentTimeMillis + timeoutMs
    var line: String = null
    while (line == null && System.currentTimeMillis < deadline) {
      if (!proc.isAlive && reader.ready() == false)
        throw new IllegalStateException(
          s"$mainClass exited (code ${proc.exitValue()}) before handshake")
      if (reader.ready()) {
        val l = reader.readLine()
        if (l != null && l.startsWith(handshakePrefix)) line = l
      } else Thread.sleep(20)
    }
    if (line == null) {
      proc.destroyForcibly()
      throw new IllegalStateException(s"$mainClass: no '$handshakePrefix' within ${timeoutMs}ms")
    }
    // keep draining stdout in the background so the child never blocks
    // on a full pipe
    val drainer = new Thread(() => {
      try { while (reader.readLine() != null) () } catch { case _: Throwable => () }
    }, "proc-stdout-drain")
    drainer.setDaemon(true)
    drainer.start()
    (proc, line)
  }

  /** Start a BusService daemon in its own JVM; returns (process, port). */
  def startDaemon(): (Process, Int) = {
    val (proc, line) =
      launch("graft.sources.BusServiceMain", Seq("0"), "BUS_PORT=")
    (proc, line.stripPrefix("BUS_PORT=").trim.toInt)
  }

  /** Start a PipelineWorker JVM; waits for WORKER_STARTED. */
  def startWorker(args: Map[String, String],
                  xmx: String = "2g",
                  timeoutMs: Long = 180000): Process = {
    val (proc, _) = launch(
      "graft.streaming.PipelineWorker",
      args.map { case (k, v) => s"$k=$v" }.toSeq,
      "WORKER_STARTED",
      jvmArgs = addOpens ++ Seq(s"-Xmx$xmx", "-Dspark.ui.enabled=false"),
      timeoutMs = timeoutMs)
    proc
  }

  def stop(proc: Process): Unit = {
    proc.destroyForcibly()
    proc.waitFor(10, TimeUnit.SECONDS)
  }
}
