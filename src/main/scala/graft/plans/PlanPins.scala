package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Checkpoint-transparent plan pinning (round-7 verdict #1/#3).
  *
  * Every `localCheckpoint` perf pin replaces its subtree with a
  * `LogicalRDD` leaf, which BLINDS every downstream plan guard: a spec
  * asserting "the pair expansion is the HOF form" or "the candidate cut
  * is TakeOrdered" can no longer see the expression it guards — this has
  * now bitten twice (r5 stats inheritance, r7 PlanGuardSpec:379). The
  * rule going forward: perf pins go through [[lazyPin]], which records
  * the pre-checkpoint plan (optimized + executed tree strings, already
  * expanded through any earlier pins) keyed by the checkpoint RDD id, so
  * [[expandedOptimized]]/[[expandedExecuted]] give guards the FULL
  * logical history of a query, checkpoints included.
  *
  * The registry is a bounded LRU of plan STRINGS (not QueryExecutions —
  * holding those would pin RDDs and leak the very blocks
  * `releaseCheckpoint` exists to free), so production overhead is two
  * `treeString` renders per pin call; `localCheckpoint` itself already
  * paid the physical planning those renders reuse.
  */
object PlanPins {
  private val MaxEntries = 64
  // rddId -> (expanded optimized plan, expanded executed plan)
  private val origins =
    new java.util.LinkedHashMap[Int, (String, String)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, (String, String)]): Boolean =
        size() > MaxEntries
    }

  /** `df.localCheckpoint(eager = false)` with the pre-checkpoint plan
    * recorded for guard expansion. Drop-in replacement for every lazy
    * perf pin in the operator library. */
  def lazyPin(df: DataFrame): DataFrame = {
    val opt = expandedOptimized(df)
    val exec = expandedExecuted(df)
    val pinned = df.localCheckpoint(eager = false)
    ColumnBridge.checkpointRdd(pinned).foreach { rdd =>
      origins.synchronized { origins.put(rdd.id, (opt, exec)) }
    }
    pinned
  }

  /** Optimized-plan tree string with every recorded checkpoint origin
    * appended (recursively — origins were stored pre-expanded). A leaf
    * whose origin was LRU-evicted gets an explicit MISSING sentinel so a
    * negative guard (e.g. `!contains("collect_list")`) cannot pass
    * vacuously against a silently blinded plan — guards must assert the
    * `checkpoint origin` marker is present (see PlanGuardSpec). */
  def expandedOptimized(df: DataFrame): String = {
    val base = df.queryExecution.optimizedPlan
    val tails = ColumnBridge.checkpointRddIds(base).map { id =>
      origins.synchronized(Option(origins.get(id))) match {
        case Some((o, _)) => s"\n-- checkpoint origin (optimized) --\n$o"
        case None => s"\n-- checkpoint origin MISSING (rdd $id) --"
      }
    }
    base.toString + tails.mkString
  }

  /** Executed-plan tree string with checkpoint origins appended (MISSING
    * sentinel on LRU eviction, as in [[expandedOptimized]]). The origin
    * executed plans are the ones compiled when the pin was created
    * (pre-AQE-execution tree for a lazy pin — exactly what the pinned
    * subquery runs when first materialized). */
  def expandedExecuted(df: DataFrame): String = {
    val exec = df.queryExecution.executedPlan
    val tails = ColumnBridge.checkpointRddIdsExec(exec).map { id =>
      origins.synchronized(Option(origins.get(id))) match {
        case Some((_, e)) => s"\n-- checkpoint origin (executed) --\n$e"
        case None => s"\n-- checkpoint origin MISSING (rdd $id) --"
      }
    }
    exec.treeString + tails.mkString
  }

  /** Recorded EXECUTED-plan origin for one checkpoint RDD id (None if
    * the pin bypassed [[lazyPin]] or was LRU-evicted). Scan-count guards
    * use this to count each pin's file scans ONCE, however many plan
    * leaves reference the pin — [[expandedExecuted]] appends the origin
    * per LEAF OCCURRENCE, which is right for content assertions but
    * would overcount a shared pin's scans (r9 verdict #2). */
  def originExecuted(id: Int): Option[String] =
    origins.synchronized(Option(origins.get(id))).map(_._2)

  /** True when every checkpoint leaf in `plan` has a recorded origin —
    * the precondition for a negative plan-guard assertion to be
    * meaningful. Guards call this (or assert the absence of the MISSING
    * sentinel) before asserting on expanded plan content. */
  def originsComplete(expanded: String): Boolean =
    !expanded.contains("-- checkpoint origin MISSING")
}
