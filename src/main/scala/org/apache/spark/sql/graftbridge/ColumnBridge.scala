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

  /** The checkpoint RDD behind a (local)checkpointed DataFrame, if its
    * root is the `LogicalRDD` leaf `Dataset.(local)Checkpoint` produces.
    * Two consumers: `releaseCheckpoint` (block-store hygiene for
    * iterative algorithms) and `PlanPins` (checkpoint-transparent plan
    * guards). */
  def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Drop the block-store blocks of a checkpointed DataFrame whose rows
    * are no longer reachable from any live plan. `localCheckpoint` pins
    * its partitions in the block manager and nothing releases them until
    * the RDD object is GC'd — which the driver's retained query
    * executions can defer indefinitely, so a loop that checkpoints every
    * round (DedupOps.clustersLoop) accumulates one full table per round
    * per INVOCATION unless superseded rounds are released explicitly
    * (round-7 verdict #3: monotone 13.8→66 s decay across re-runs). */
  def releaseCheckpoint(df: DataFrame): Unit =
    checkpointRdd(df).foreach(releaseChain)

  /** Release EVERY checkpoint leaf reachable in `df`'s analyzed plan —
    * for a caller that is completely done with a result whose plan scans
    * one or more checkpointed tables (e.g. the final label table
    * `DedupOps.clusters` returns). After this the frame must not be
    * executed again. */
  def releaseAllCheckpoints(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => releaseChain(lr.rdd)
      case _ =>
    }

  /** A `LogicalRDD` produced by `freshLogicalRdd`/`intoSession` wraps
    * the persisted checkpoint RDD in derived (projection) RDDs, so the
    * node's own `rdd` holds no blocks — walk the narrow dependency chain
    * to the FIRST persisted ancestor (the checkpoint block holder),
    * unpersist it, and STOP. Recursing past a persisted ancestor is
    * unsafe (r8 ADVICE): on a lazy not-yet-materialized pin the lineage
    * is not yet truncated, so the walk would reach UPSTREAM persisted
    * RDDs — e.g. another live checkpoint feeding a second consumer — and
    * local-checkpoint blocks are unrecoverable once dropped. Anything
    * above the first persisted ancestor is by construction a different
    * pin with its own owner and its own release call. Chains are a
    * handful of in-JVM hops (checkpoint → scan → projection); no job is
    * run. */
  private def releaseChain(rdd: org.apache.spark.rdd.RDD[_]): Unit = {
    muteUnpersistWarn
    if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
      rdd.unpersist(blocking = false) // block holder found — stop here
    else
      rdd.dependencies.foreach(d => releaseChain(d.rdd))
  }

  // unpersisting a locally-checkpointed RDD logs "lineage has been
  // truncated and cannot be recomputed" at WARN — accurate, and exactly
  // the intent here (superseded loop rounds are never executed again),
  // but it fires once per released round per query and reads like a
  // fault. Raise that one logger to ERROR; MapPartitionsRDD logs nothing
  // else at WARN in normal operation.
  private lazy val muteUnpersistWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  /** Block until the SparkListener bus has delivered every queued event
    * (`LiveListenerBus.waitUntilEmpty` is `private[spark]`). Test-side
    * stage-count assertions need this: `onStageSubmitted` is delivered
    * asynchronously, so counting stages right after an action races the
    * bus — the executed-scan-stage guard (PlanGuardSpec's exchange-reuse
    * proof) drains first, then reads its counter. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** RDD ids of every checkpoint (`LogicalRDD`) leaf in a logical plan —
    * the key `PlanPins` uses to resolve a checkpointed leaf back to the
    * plan that produced it. */
  def checkpointRddIds(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[Int] =
    plan.collect { case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id }

  /** Same, over a physical plan (`RDDScanExec` / `ExternalRDDScanExec`
    * leaves), so executed-plan guards can also see through checkpoints.
    * Both AQE wrappers are LEAF nodes that hide their subtrees from
    * TreeNode.collect: the unexecuted `AdaptiveSparkPlanExec` AND — once
    * the frame has run — the materialized `QueryStageExec` stages (the
    * r12/r13 AQE-leaf class); descend into both explicitly so guards
    * see the same pins before and after execution. */
  def checkpointRddIdsExec(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
    plan.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => Seq(r.rdd.id)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        checkpointRddIdsExec(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        checkpointRddIdsExec(q.plan)
    }.flatten
}
