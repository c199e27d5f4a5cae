package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.InMemoryBus

/** Streaming-runner throughput bench: N JSON messages through the full
  * bus → deserialize → transform → serialize → publish → ack path.
  *
  * Context (BASELINE.md): the reference's architectural bound is
  * ≤ bulk_limit (20) messages per synchronous pull round-trip with a
  * single transform thread (`pubsub_pipeline.py:195-200,172-193`). The
  * micro-batch runner amortizes the pull per batch and parallelizes the
  * transform across cores, so msgs/s here is the number to compare.
  * Prints one JSON line like Bench.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val id = java.util.UUID.randomUUID().toString.take(8)
    val (inTopic, inSub, outTopic, outSub) =
      (s"sb-in-$id", s"sb-insub-$id", s"sb-out-$id", s"sb-outsub-$id")
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)

    (0 until n).foreach(i => InMemoryBus.publish(inTopic,
      s"""{"data":"message payload $i","nested":{"nestedData":"v$i"}}""".getBytes(UTF_8)))

    val schema = new StructType()
      .add("data", "string")
      .add("nested", new StructType().add("nestedData", "string"))
    val readParts = sys.env.getOrElse("SPARK_GRAFT_READ_PARTS", "4").toInt
    val pipe = new Pipeline(spark, inSub, outTopic, JsonSerde(schema),
      df => df.select(upper(col("payload.data")).as("data"),
        col("payload.nested.nestedData").as("nested")),
      Files.createTempDirectory("sbench-ckpt").toString,
      bulkLimit = 10000, readPartitions = readParts)
    val t0 = System.nanoTime()
    val q = pipe.start(availableNow = true)
    q.awaitTermination(300000)
    val secs = (System.nanoTime() - t0) / 1e9
    val out = InMemoryBus.payloads(outSub).size
    require(out == n, s"expected $n published, got $out")
    println(s"""{"metric":"stream_msgs_per_sec","value":${(n / secs).round},"unit":"msgs/sec","n":$n,"secs":$secs,"readPartitions":$readParts,"reference_bound":"~20 msgs per pull RTT, 1 transform thread"}""")
    spark.stop()
  }
}
