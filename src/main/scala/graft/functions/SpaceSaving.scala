package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving heavy-hitters sketch (Metwally et al. 2005, "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams") as a
  * mergeable Spark `Aggregator` — the constant-memory answer to "top
  * words/domains/urls over a corpus too wide to groupBy exactly".
  * `agg_mode` and `text_wordcount` are the exact forms: they shuffle one
  * row per DISTINCT key, which at web scale (billions of distinct
  * urls/grams) is itself the bottleneck. The sketch caps state at
  * `capacity` counters per partition, map-side combines, and merges
  * associatively (Agarwal et al. 2012, "Mergeable Summaries"), so the
  * plan is ONE constant-width shuffle row per partition regardless of
  * key cardinality.
  *
  * Guarantees (the spec asserts these, not exact values — which
  * counter an evicted key lands on depends on partition order, like any
  * mergeable sketch): with n total observations,
  *  - overestimate-only: trueCount ≤ estimate ≤ trueCount + err,
  *  - err ≤ n / capacity,
  *  - every key with trueCount > n / capacity is present (no false
  *    negatives above the threshold).
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)], key: String): Map[String, (Long, Long)] =
    buf.get(key) match {
      case Some((c, e)) => buf.updated(key, (c + 1, e))
      case None if buf.size < capacity => buf.updated(key, (1L, 0L))
      case None =>
        // evict the minimum-count counter; the newcomer inherits its
        // count as upper bound, recording the inheritance as `err`
        val (mk, (mc, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        (buf - mk).updated(key, (mc + 1, mc))
    }

  override def merge(a: Map[String, (Long, Long)],
                     b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    // mergeable-summaries combine: a key absent from one side is counted
    // at most that side's minimum counter — add it as overestimate+err,
    // keeping the overestimate-only invariant; then truncate to capacity
    // (count desc, key asc — deterministic GIVEN the two inputs)
    val minA = if (a.size < capacity) 0L else a.valuesIterator.map(_._1).min
    val minB = if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min
    val all = (a.keySet ++ b.keySet).iterator.map { k =>
      val (ca, ea) = a.getOrElse(k, (minA, minA))
      val (cb, eb) = b.getOrElse(k, (minB, minB))
      k -> (ca + cb, ea + eb)
    }.toSeq
    all.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity).toMap
  }

  /** Emit count-desc (key tiebreak) so callers get ranked hitters. */
  override def finish(buf: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    buf.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object SpaceSaving {
  /** Column API: Space-Saving sketch of a STRING column. Returns
    * `array<struct<_1: key, _2: estimate, _3: err>>` ranked by estimate
    * desc. */
  def heavyHitters(c: Column, capacity: Int): Column =
    udaf(new SpaceSaving(capacity), Encoders.STRING).apply(c)
}
