package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-sink helpers for `foreachBatch`. */
object Sinks {

  /** Idempotent parquet sink: each micro-batch lands in its own
    * `batch_id=<id>` partition with DYNAMIC partition overwrite, so a
    * replayed batch (crash after write, before the epoch commit)
    * REPLACES its own partition instead of appending duplicates — the
    * file-sink analog of the bus's keyed idempotent publish, and the
    * standard exactly-once-to-files pattern when no transactional table
    * format is available. Readers see `dir` as one table (partition
    * column included); the batch_id partitioning also gives free
    * per-batch lineage/debugging. */
  def idempotentParquet(dir: String)(batch: DataFrame, batchId: Long): Unit =
    batch
      .withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)
}
