package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.sources.InMemoryBus

/** Manual end-to-end drive of the bus pipeline (also a debugging aid). */
object BusDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    InMemoryBus.createTopic("in"); InMemoryBus.createSubscription("in", "insub")
    InMemoryBus.createTopic("out"); InMemoryBus.createSubscription("out", "outsub")
    (1 to 3).foreach(i => InMemoryBus.publish("in",
      s"""{"data":"msg $i","nested":{"nestedData":"x"}}""".getBytes(UTF_8)))
    println(s"[demo] endOffset=${InMemoryBus.endOffset("insub")}")

    val schema = new StructType()
      .add("data", "string")
      .add("nested", new StructType().add("nestedData", "string"))
    val pipe = new Pipeline(spark, "insub", "out", JsonSerde(schema),
      df => df.select(col("payload.*")),
      Files.createTempDirectory("demo-ckpt").toString)
    val q = pipe.start(availableNow = true)
    q.awaitTermination(60000)
    println(s"[demo] exception=${q.exception}")
    println(s"[demo] progress=${q.recentProgress.map(p => p.numInputRows).toSeq}")
    println(s"[demo] out=${InMemoryBus.payloads("outsub").map(new String(_, UTF_8))}")
    println(s"[demo] committed=${InMemoryBus.committedOffset("insub")}")
    spark.stop()
  }
}
