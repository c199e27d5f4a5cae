package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.{Bus, BusRegistry, BusService, InMemoryBus}

/** Streaming-runner throughput bench: N JSON messages through the full
  * bus → deserialize → transform → serialize → publish → ack path, at
  * three payload sizes (the per-message overhead vs per-byte cost split).
  *
  * Context (BASELINE.md): the reference's architectural bound is
  * ≤ bulk_limit (20) messages per synchronous pull round-trip with a
  * single transform thread (`pubsub_pipeline.py:195-200,172-193`). The
  * micro-batch runner amortizes the pull per batch and parallelizes the
  * transform across cores, so msgs/s here is the number to compare.
  *
  * Prints one JSON line (like Bench) and writes the full result to
  * `docs/STREAMBENCH.json` (override: SPARK_GRAFT_STREAMBENCH) so the
  * throughput numbers are on record per round.
  */
object StreamBench {

  private def runOne(spark: SparkSession, label: String, payloadBytes: Int,
                     n: Int, readParts: Int, busSpec: String = "memory")
      : (String, Long, Double, Double) = {
    val bus: Bus = BusRegistry.resolve(busSpec)
    val id = java.util.UUID.randomUUID().toString.take(8)
    val (inTopic, inSub, outTopic, outSub) =
      (s"sb-in-$id", s"sb-insub-$id", s"sb-out-$id", s"sb-outsub-$id")
    bus.createTopic(inTopic); bus.createSubscription(inTopic, inSub)
    bus.createTopic(outTopic); bus.createSubscription(outTopic, outSub)
    // the filler field pads each message to ≈payloadBytes JSON bytes
    val overhead = """{"data":"message payload 000000","nested":{"nestedData":"v000000"},"fill":""}""".length
    val fill = "x" * math.max(0, payloadBytes - overhead)
    var totalBytes = 0L
    (0 until n).grouped(2000).foreach { chunk =>
      val msgs = chunk.map { i =>
        val msg =
          s"""{"data":"message payload $i","nested":{"nestedData":"v$i"},"fill":"$fill"}"""
            .getBytes(UTF_8)
        totalBytes += msg.length
        msg
      }
      bus.publishBatch(inTopic, msgs)
    }
    val schema = new StructType()
      .add("data", "string")
      .add("nested", new StructType().add("nestedData", "string"))
      .add("fill", "string")
    val pipe = new Pipeline(spark, inSub, outTopic, JsonSerde(schema),
      df => df.select(upper(col("payload.data")).as("data"),
        col("payload.nested.nestedData").as("nested"),
        length(col("payload.fill")).as("fill_len")),
      Files.createTempDirectory("sbench-ckpt").toString,
      bulkLimit = 10000, readPartitions = readParts, busSpec = busSpec)
    val t0 = System.nanoTime()
    val q = pipe.start(availableNow = true)
    q.awaitTermination(300000)
    val secs = (System.nanoTime() - t0) / 1e9
    val out = bus.payloads(outSub).size
    require(out == n, s"$label: expected $n published, got $out")
    (label, (n / secs).round, totalBytes / secs / 1e6, secs)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val readParts = sys.env.getOrElse("SPARK_GRAFT_READ_PARTS", "4").toInt
    // SPARK_GRAFT_STREAM_BUS=socket measures the full path through a
    // BusService over TCP (daemon in-JVM; every byte still crosses the
    // loopback socket + protocol, which is what costs) — the transport
    // tax of the cross-process bus relative to the in-JVM singleton
    val busMode = sys.env.getOrElse("SPARK_GRAFT_STREAM_BUS", "memory")
    val busSpec = busMode match {
      case "socket" =>
        val svc = new BusService()
        val port = svc.start()
        s"socket://127.0.0.1:$port"
      case other => other
    }
    // message-bound (tiny), balanced (1 KB), byte-bound (10 KB)
    val configs = Seq(("small_80B", 80, 100000),
      ("medium_1KB", 1024, 50000), ("large_10KB", 10240, 10000))
    // warmup: JIT + streaming-engine spin-up billed once, not to small_80B
    runOne(spark, "warmup", 80, 2000, readParts, busSpec)
    val results = configs.map { case (label, size, n) =>
      runOne(spark, label, size, n, readParts, busSpec)
    }
    val rows = results.map { case (label, mps, mbps, secs) =>
      s"""    "$label": {"msgs_per_sec": $mps, "mb_per_sec": ${f"$mbps%.1f"}, "secs": ${f"$secs%.2f"}}"""
    }.mkString("{\n", ",\n", "\n  }")
    val json =
      s"""{
         |  "metric": "stream_throughput",
         |  "unit": "msgs/sec",
         |  "bus": "$busMode",
         |  "readPartitions": $readParts,
         |  "reference_bound": "~20 msgs per pull RTT, 1 transform thread",
         |  "configs": $rows
         |}
         |""".stripMargin
    val path = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH",
      "/root/repo/docs/STREAMBENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    catch { case e: Throwable =>
      System.err.println(s"[streambench] artifact write failed: ${e.getMessage}")
    }
    val line = results.map { case (label, mps, _, _) => s""""$label":$mps""" }
      .mkString(",")
    println(s"""{"metric":"stream_msgs_per_sec","unit":"msgs/sec",$line,"full":"docs/STREAMBENCH.json"}""")
    spark.stop()
  }
}
