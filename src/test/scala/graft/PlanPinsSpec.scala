package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.PlanPins

/** Checkpoint-transparent guard machinery (r7 verdict #1/#3).
  *
  * Every lazy `localCheckpoint` perf pin collapses its subtree into a
  * `LogicalRDD` leaf; these tests prove (a) the blindness is real, (b)
  * `PlanPins` restores sight through the pin, and (c) — the MUTATION
  * test — a guard written against the expanded plan still fails when the
  * guarded expression is genuinely replaced, so the expansion cannot
  * mask a regression.
  */
class PlanPinsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  // the guarded shape: HOF pair expansion (what cooccurPmi pins)
  private def hofPairs = {
    val ws = split(lower(col("text")), "\\s+")
    val hs = transform(ws, w => xxhash64(w))
    val prs = flatten(transform(hs, (h, i) =>
      transform(slice(hs, i + lit(2), lit(2)), v =>
        struct(least(h, v).as("h1"), greatest(h, v).as("h2")))))
    docs.select(explode(prs).as("p"))
      .groupBy(col("p.h1").as("h1"), col("p.h2").as("h2"))
      .agg(count(lit(1)).as("cnt"))
  }

  // the mutant: same output schema, pair expansion via a collection
  // aggregate — exactly the shape the cooccurPmi guard exists to reject
  private def mutantPairs = {
    val ws = split(lower(col("text")), "\\s+")
    docs.select(explode(ws).as("w"), col("doc_id"))
      .groupBy("doc_id").agg(collect_list(xxhash64(col("w"))).as("hs"))
      .select(explode(expr(
        "flatten(transform(hs, (h, i) -> transform(slice(hs, i + 2, 2), " +
          "v -> struct(least(h, v) AS h1, greatest(h, v) AS h2))))")).as("p"))
      .groupBy(col("p.h1").as("h1"), col("p.h2").as("h2"))
      .agg(count(lit(1)).as("cnt"))
  }

  test("a lazy checkpoint pin BLINDS the raw plan (the failure mode is real)") {
    val pinned = PlanPins.lazyPin(hofPairs.orderBy(col("cnt").desc).limit(10))
    val downstream = pinned.filter(col("cnt") > 0)
    val raw = downstream.queryExecution.optimizedPlan.toString
    assert(!raw.contains("flatten"),
      s"expected the checkpoint to hide the HOF expansion from the raw plan:\n$raw")
  }

  test("expandedOptimized restores sight through the pin") {
    val pinned = PlanPins.lazyPin(hofPairs.orderBy(col("cnt").desc).limit(10))
    val downstream = pinned.filter(col("cnt") > 0)
    val expanded = PlanPins.expandedOptimized(downstream)
    assert(expanded.contains("transform") && expanded.contains("flatten"),
      s"expanded plan lost the checkpoint origin:\n$expanded")
    assert(expanded.contains("checkpoint origin"),
      "expansion marker missing — origin not resolved")
  }

  test("MUTATION: the guard still fails when the HOF expansion is replaced") {
    // pin the mutant exactly the way production pins the real query; the
    // cooccurPmi guard's assertions must reject it THROUGH the pin
    val pinned = PlanPins.lazyPin(mutantPairs.orderBy(col("cnt").desc).limit(10))
    val expanded = PlanPins.expandedOptimized(pinned.filter(col("cnt") > 0))
    assert(expanded.contains("collect_list"),
      s"mutant's collection aggregate must be visible through the pin:\n$expanded")
    // i.e. the guard `!plan.contains("collect_list")` fires on the mutant
  }

  test("expandedExecuted sees physical shapes behind the pin; nesting recurses") {
    val inner = PlanPins.lazyPin(hofPairs.orderBy(col("cnt").desc).limit(10))
    val outer = PlanPins.lazyPin(inner.filter(col("cnt") > 0))
    val exec = PlanPins.expandedExecuted(outer.select(col("h1")))
    assert(exec.contains("TakeOrderedAndProject"),
      s"origin executed plan (TakeOrdered cut) not visible through nested pins:\n$exec")
    assert(exec.contains("flatten"),
      s"inner pin's origin lost through the outer pin:\n$exec")
  }

  test("an unrecorded/evicted origin surfaces as an explicit MISSING sentinel") {
    // a checkpoint whose origin was never recorded (the same observable
    // state as an LRU-evicted lazyPin in a long-lived session) must NOT
    // silently return the blinded base plan: negative guards assert
    // originsComplete, so eviction turns into a loud failure, not a
    // vacuous pass (r8 ADVICE, PlanPins.scala:26)
    val pinned = hofPairs.orderBy(col("cnt").desc).limit(10)
      .localCheckpoint(eager = false) // raw pin — bypasses lazyPin on purpose
    val expanded = PlanPins.expandedOptimized(pinned.filter(col("cnt") > 0))
    assert(expanded.contains("-- checkpoint origin MISSING (rdd "),
      s"no MISSING sentinel for an unrecorded checkpoint origin:\n$expanded")
    assert(!PlanPins.originsComplete(expanded),
      "originsComplete must be false when a sentinel is present")
    val exec = PlanPins.expandedExecuted(pinned.filter(col("cnt") > 0))
    assert(exec.contains("-- checkpoint origin MISSING (rdd "),
      s"executed-side expansion lacks the MISSING sentinel:\n$exec")
  }

  test("lazyPin materializes the same rows as the unpinned plan") {
    val base = hofPairs.orderBy(col("cnt").desc, col("h1"), col("h2")).limit(5)
    val pinned = PlanPins.lazyPin(base)
    assert(pinned.collect().toSeq == base.collect().toSeq)
    ColumnBridge.releaseCheckpoint(pinned)
  }
}
