package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.DataType

import graft.sources.{BusProvider, InMemoryBus}

/** Pluggable payload serde — the engine's version of the reference's
  * `message_deserializer` / `result_serializer` pair
  * (`pubsub_pipeline.py:66-67`). Column-to-Column so it stays inside
  * codegen; the JSON default mirrors `byte_load_json`/`byte_encode_json`
  * (`pubsub_pipeline.py:27-28,55-57`).
  */
trait Serde {
  /** bytes column → typed payload column. */
  def deserialize(value: Column): Column
  /** typed payload struct → bytes column. */
  def serialize(payload: Column): Column
}

/** Default JSON serde: UTF-8 bytes ⇄ struct via from_json/to_json. */
final case class JsonSerde(schema: DataType) extends Serde {
  override def deserialize(value: Column): Column =
    from_json(value.cast("string"), schema)
  override def serialize(payload: Column): Column =
    to_json(payload).cast("binary")
}

/** Identity serde: raw bytes through. */
case object BytesSerde extends Serde {
  override def deserialize(value: Column): Column = value
  override def serialize(payload: Column): Column = payload.cast("binary")
}

/** The streaming runner (SURVEY §7 M4): bus-subscription in → deserialize
  * → user transform → serialize → bus-topic out, with ack-after-publish.
  *
  * Decomposition mirrors the reference: `PubSubPipeline` owns plumbing,
  * the `processor` slot owns logic (`pubsub_pipeline.py:62,90-91`). Here
  * the slot is `transform: DataFrame => DataFrame` — any operator from
  * `graft.operators` composes in unchanged, which is how the batch
  * library and the streaming runner stay one engine.
  *
  * Delivery contract: at-least-once. The source's `commit(offset)` (ack)
  * runs only after `foreachBatch` returns, i.e. after every row of the
  * batch was published (`pubsub_pipeline.py:82-84` semantics, backed by
  * the checkpoint WAL instead of an in-flight future callback —
  * SURVEY §3.4). A crash between publish and checkpoint replays the
  * batch: duplicates possible, never loss (§2-D documented window).
  */
final class Pipeline(
    spark: SparkSession,
    subscription: String,
    outTopic: String,
    serde: Serde,
    transform: DataFrame => DataFrame,
    checkpointDir: String,
    bulkLimit: Int = 20,
    /** Publish with (batchId, partition, index) idempotence keys: a batch
      * replayed after crash-before-checkpoint re-publishes the same keys
      * and the bus absorbs them — effective exactly-once, vs the
      * reference's duplicates (§2-D). Requires the transform to be
      * deterministic (same replayed batch → same rows per partition). */
    idempotent: Boolean = false) {

  /** The streaming DataFrame: payload column is `payload`, plus the bus
    * metadata columns (ackId/messageId/publishTime/attributes). */
  def stream(): DataFrame =
    spark.readStream
      .format(BusProvider.format)
      .option("subscription", subscription)
      .option("bulkLimit", bulkLimit)
      .load()
      .withColumn("payload", serde.deserialize(col("value")))

  /** Start the pipeline. `availableNow = true` gives a bounded drain-and-
    * stop run (the fixed version of `max_processed_messages`, §2-D).
    *
    * Acking: the engine only invokes `MicroBatchStream.commit()` lazily
    * (when planning a later batch), so a bounded run would finish with the
    * last batch published-but-unacked. The listener below acks on every
    * `QueryProgress` event — emitted after the batch's offset/commit logs
    * are durable and `foreachBatch` (the publish) returned, which is
    * precisely the reference's "ack only after successful publish"
    * (`pubsub_pipeline.py:82-84`) ordering, with a WAL under it. */
  def start(availableNow: Boolean = false): StreamingQuery = {
    val out = transform(stream())
    val ackListener = new AckOnCommitListener(spark, subscription)
    spark.streams.addListener(ackListener)
    // if start() itself throws, unregister the listener — an unbound
    // listener would buffer every future query's progress events forever
    val q = try {
      out
        .select(serde.serialize(struct(out.columns.map(col).toIndexedSeq: _*)).as("data"))
        .writeStream
        .option("checkpointLocation", checkpointDir)
        .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(0))
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val topic = outTopic
          val idem = idempotent
          // Executor-side publish: no collect-to-driver. On the in-memory
          // bus this is same-JVM; against a real service each partition
          // holds one publisher client.
          batch.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            var i = 0L
            rows.foreach { r =>
              val data = r.getAs[Array[Byte]](0)
              if (idem) InMemoryBus.publishIdempotent(topic, s"$batchId-$pid-$i", data)
              else InMemoryBus.publish(topic, data)
              i += 1
            }
          }
        }
        .start()
    } catch {
      case e: Throwable => spark.streams.removeListener(ackListener); throw e
    }
    ackListener.bind(q.runId)
    q
  }

  /** Graceful shutdown between micro-batches — the engine's
    * `GracefulKiller` (`pubsub_pipeline.py:15-24,147-154`): a JVM
    * shutdown hook stops the query cleanly so the last committed batch
    * stays consistent (pre-emptible-VM support). */
  def withShutdownHook(q: StreamingQuery): StreamingQuery = {
    sys.addShutdownHook { if (q.isActive) q.stop() }
    q
  }
}
