package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Stand-alone pipeline process for the cross-process harness (round-8
  * verdict #1): runs ONE [[Pipeline]] against a bus daemon in another
  * process, so the suites can prove the reference's core semantic —
  * ack-on-publish-success — across real process boundaries, and prove
  * redelivery by `kill -9`ing this process mid-run and relaunching it
  * on the same checkpoint (the reference's own harness is cross-process:
  * `test_client.py:6-31`).
  *
  * Args are `key=value` pairs:
  *   bus=socket://host:port   (required — the daemon)
  *   sub=<subscription>       (required — input)
  *   out=<topic>              (required — output)
  *   checkpoint=<dir>         (required)
  *   master=local[2] | local-cluster[2,4,2048]   (default local[2])
  *   mode=drain | run         (drain = Trigger.AvailableNow, exit when
  *                             done; run = ProcessingTime(0) until killed)
  *   sleepMs=<per-row delay>  (default 0 — widens the kill window)
  *   idempotent=true|false    (default false)
  *   bulkLimit=<n>            (default 20)
  *   readPartitions=<n>       (default 4)
  *   execCp=<classpath>       (spark.executor.extraClassPath for
  *                             local-cluster executor JVMs)
  *
  * Prints `WORKER_STARTED` once the query is running (launcher
  * handshake). Payloads are JSON `{"data": "..."}`; the transform is the
  * identity pass-through (with the optional per-row sleep), so the test
  * JVM can assert exact payload completeness after crash-replay.
  */
object PipelineWorker {
  def main(args: Array[String]): Unit = {
    val a = args.map { s =>
      val i = s.indexOf('=')
      require(i > 0, s"bad arg: $s")
      s.substring(0, i) -> s.substring(i + 1)
    }.toMap
    val master = a.getOrElse("master", "local[2]")
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-pipeline-worker")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      a.get("execCp").foreach(cp => builder.config("spark.executor.extraClassPath", cp))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val schema = new StructType().add("data", "string")
    val sleepMs = a.getOrElse("sleepMs", "0").toLong
    val slow = udf { s: String => if (sleepMs > 0) Thread.sleep(sleepMs); s }
    val pipeline = new Pipeline(
      spark,
      subscription = a("sub"),
      outTopic = a("out"),
      serde = JsonSerde(schema),
      transform = df => df.select(slow(col("payload.data")).as("data")),
      checkpointDir = a("checkpoint"),
      bulkLimit = a.getOrElse("bulkLimit", "20").toInt,
      idempotent = a.getOrElse("idempotent", "false").toBoolean,
      readPartitions = a.getOrElse("readPartitions", "4").toInt,
      busSpec = a("bus"))

    val drain = a.getOrElse("mode", "drain") == "drain"
    val q = pipeline.withShutdownHook(pipeline.start(availableNow = drain))
    println("WORKER_STARTED")
    System.out.flush()
    if (drain) {
      q.awaitTermination()
      spark.stop()
      sys.exit(0)
    } else {
      q.awaitTermination() // runs until the process is killed
    }
  }
}
