package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.InMemoryBus

/** Resume-under-load soak: a paced feeder thread publishes continuously
  * at the StreamBench-measured rate while the pipeline is STOPPED and
  * RESTARTED from its checkpoint several times mid-stream — the
  * A9–A11 contract (ack only after publish, bounded drain, graceful
  * shutdown; `pubsub_pipeline.py:82-84,147-154`) exercised under
  * sustained load instead of the unit-scale spec fixtures
  * (PipelineSpec's stop/resume test moves hundreds of messages; this
  * moves hundreds of thousands across 5 restart boundaries).
  *
  * Idempotent publish keys are ON, so the pass criterion is EXACT
  * end-to-end: after the final bounded drain, the output subscription
  * holds precisely ONE copy of each fed message id (a batch replayed
  * across a stop boundary re-publishes the same content-derived keys
  * and the bus absorbs them), and the input subscription is acked to
  * its end offset. A mid-batch stop may terminate the query forcefully
  * (recorded separately from graceful stops) — the WAL + key replay
  * must still converge to exactly-once, which is the point.
  *
  * Prints one JSON line and writes `docs/STREAMSOAK.json`
  * (override: SPARK_GRAFT_STREAMSOAK). Knobs: SPARK_GRAFT_SOAK_N
  * (messages), SPARK_GRAFT_SOAK_RATE (msgs/s), SPARK_GRAFT_SOAK_CYCLES
  * (stop/restart rounds), SPARK_GRAFT_SOAK_RUN_MS (run window per
  * cycle).
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SOAK_N", "600000").toInt
    val rate = sys.env.getOrElse("SPARK_GRAFT_SOAK_RATE", "50000").toInt
    val cycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "5").toInt
    val runMs = sys.env.getOrElse("SPARK_GRAFT_SOAK_RUN_MS", "2000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val id = java.util.UUID.randomUUID().toString.take(8)
    val (inTopic, inSub) = (s"soak-in-$id", s"soak-insub-$id")
    val (outTopic, outSub) = (s"soak-out-$id", s"soak-outsub-$id")
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)

    // paced feeder: `rate` msgs/s in 1 ms quanta, runs through every
    // stop/restart boundary so there is always a live backlog
    val fed = new AtomicLong(0)
    val perMs = math.max(1, rate / 1000)
    val feeder = new Thread(() => {
      var i = 0L
      var windowStart = System.nanoTime()
      var inWindow = 0
      while (i < n) {
        InMemoryBus.publish(inTopic, s"""{"i":$i,"tag":"soak"}""".getBytes(UTF_8))
        fed.incrementAndGet(); i += 1; inWindow += 1
        if (inWindow >= perMs) {
          val elapsed = System.nanoTime() - windowStart
          if (elapsed < 1000000L)
            java.util.concurrent.locks.LockSupport.parkNanos(1000000L - elapsed)
          windowStart = System.nanoTime(); inWindow = 0
        }
      }
    }, "soak-feeder")

    val schema = new StructType().add("i", "long").add("tag", "string")
    val ckpt = Files.createTempDirectory("soak-ckpt").toString
    def pipe() = new Pipeline(spark, inSub, outTopic, JsonSerde(schema),
      df => df.select(col("payload.i").as("i"), col("payload.tag").as("tag")),
      ckpt, bulkLimit = 20000, idempotent = true, readPartitions = 4)

    val t0 = System.nanoTime()
    feeder.start()
    var graceful = 0
    var forced = 0
    (1 to cycles).foreach { c =>
      val q = pipe().start(availableNow = false)
      Thread.sleep(runMs)
      try { q.stop(); q.awaitTermination(); graceful += 1 }
      catch { case _: Throwable => forced += 1 } // mid-batch interrupt: WAL + keys absorb
      System.err.println(s"[soak] cycle $c: fed=${fed.get()} " +
        s"acked=${InMemoryBus.committedOffset(inSub)}")
    }
    feeder.join()
    // final bounded drain (A10): everything still unacked flows once more
    val qf = pipe().start(availableNow = true)
    qf.awaitTermination(600000)
    val secs = (System.nanoTime() - t0) / 1e9

    val outs = InMemoryBus.payloads(outSub)
    val idRe = """"i":(\d+)""".r
    val ids = outs.flatMap(b =>
      idRe.findFirstMatchIn(new String(b, UTF_8)).map(_.group(1).toLong))
    val distinct = ids.toSet
    val acked = InMemoryBus.committedOffset(inSub)
    val end = InMemoryBus.endOffset(inSub)
    val dupes = outs.size - distinct.size
    val missing = n - distinct.size
    require(outs.size == n, s"exactly-once violated: $n fed, ${outs.size} out " +
      s"($dupes duplicate, $missing missing)")
    require(distinct.size == n && (0L until n.toLong).forall(distinct),
      s"coverage hole: ${distinct.size} distinct of $n")
    require(acked == end, s"unacked backlog after drain: $acked of $end")

    val json =
      s"""{
         |  "metric": "stream_resume_soak",
         |  "messages": $n,
         |  "feed_rate_msgs_per_sec": $rate,
         |  "restarts": $cycles,
         |  "graceful_stops": $graceful,
         |  "forced_stops": $forced,
         |  "elapsed_sec": ${f"$secs%.2f"},
         |  "effective_msgs_per_sec": ${(n / secs).round},
         |  "duplicates": $dupes,
         |  "missing": $missing,
         |  "acked_to_end": ${acked == end}
         |}
         |""".stripMargin
    val path = sys.env.getOrElse("SPARK_GRAFT_STREAMSOAK",
      "/root/repo/docs/STREAMSOAK.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    catch { case e: Throwable =>
      System.err.println(s"[soak] artifact write failed: ${e.getMessage}")
    }
    println(s"""{"metric":"stream_resume_soak","messages":$n,"restarts":$cycles,""" +
      s""""duplicates":$dupes,"missing":$missing,"acked_to_end":${acked == end},""" +
      s""""effective_msgs_per_sec":${(n / secs).round},"full":"docs/STREAMSOAK.json"}""")
    spark.stop()
  }
}
