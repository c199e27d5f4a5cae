package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column⇄Expression converters — the
  * supported way for an external library to wrap custom Catalyst
  * expressions as user-facing Columns in Spark 4's classic runtime.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebuild a materialized (checkpointed/cached) DataFrame as a bare
    * `LogicalRDD` with DEFAULT statistics, dropping the origin stats the
    * checkpoint copied from its parent plan. Iterative algorithms need
    * this: `Dataset.localCheckpoint` truncates the lineage but keeps
    * `originStats`, whose `sizeInBytes` is a PRODUCT of the parent
    * plan's BigInt sizes — chained round over round the bit-length
    * doubles each iteration, and by ~round 25 Catalyst's join-stats
    * visitor is multiplying million-bit BigIntegers on the driver
    * (observed as a non-terminating stats pass in DedupOps.clusters).
    * The InternalRow RDD is reused as-is — no row conversion, no extra
    * job; only the statistics lineage is severed. */
  def freshLogicalRdd(df: DataFrame): DataFrame = {
    val classicDf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    val spark = classicDf.sparkSession
    spark.internalCreateDataFrame(
      classicDf.queryExecution.toRdd, classicDf.schema, isStreaming = false)
  }

  /** Re-root a DataFrame's InternalRow RDD under a DIFFERENT session —
    * the cloned-session device `DedupOps.clusters` uses to size its loop
    * shuffles in an isolated SQL conf instead of mutating the caller's
    * session-global `spark.sql.shuffle.partitions`. The physical plan of
    * `df` itself compiles under its own session (shuffle-free in the
    * intended use, so that conf is irrelevant); everything DERIVED from
    * the returned frame plans under `target`'s conf. No row conversion —
    * the InternalRow RDD is shared (same SparkContext). */
  def intoSession(df: DataFrame, target: org.apache.spark.sql.SparkSession): DataFrame = {
    val classicDf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    target.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(
        classicDf.queryExecution.toRdd, classicDf.schema, isStreaming = false)
  }

  /** Non-blocking read of an Observation's metric map (empty until the
    * listener bus delivers it). The public `get` BLOCKS until delivery —
    * polling this instead avoids ever parking a thread on a listener bus
    * that may be slow or broken (ADVICE r5: a timed-out Future around a
    * blocking `get` leaked one permanently-parked thread per round). */
  def observationOrEmpty(obs: org.apache.spark.sql.Observation): Map[String, Any] =
    obs.getOrEmpty
}
