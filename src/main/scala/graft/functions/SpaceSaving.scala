package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable Metwally stream-summary: the count-bucketed doubly-linked
  * layout from the Space-Saving paper, giving O(1) increment and O(1)
  * eviction per observation. The r8 immutable-Map form paid a HAMT copy
  * per row plus an O(capacity) `minBy` scan per eviction — on the
  * evict-heavy path that is precisely the sketch's target regime
  * (key cardinality >> capacity), the per-row cost was linear in the
  * sketch size (r8 verdict, "What's wrong #2").
  *
  * Structure: `map` keys → nodes; nodes live in per-count Buckets that
  * form an ascending doubly-linked list, so the minimum-count bucket is
  * the list head and an increment moves a node at most one bucket up.
  * Eviction takes the min bucket's TAIL — the least-recently-touched
  * minimum counter — which is deterministic given the input sequence
  * (like the r8 form's smallest-key tiebreak, the assignment is still
  * partition-order-dependent across runs, which is why the query stays
  * declared-✗ no-oracle).
  *
  * Serialization (shuffle boundary): a flat (key, count, err) stream in
  * bucket-ascending order — no linked-structure recursion, O(capacity)
  * bytes. A deserialized buffer is only ever `merge`d (object
  * aggregation keeps live buffers as JVM objects within a partition),
  * and merge re-sorts, so the rebuild order carries no semantics.
  */
final class StreamSummary(val capacity: Int) extends Serializable {
  import StreamSummary.{Bucket, Node}
  require(capacity > 0, s"capacity must be positive: $capacity")

  @transient private var map = new java.util.HashMap[String, Node]()
  @transient private var minBucket: Bucket = _

  def size: Int = map.size

  /** Smallest live counter value (0 while the sketch is under capacity)
    * — the merge combine's "absent key counted at most min" bound. */
  def minCount: Long =
    if (map.size < capacity || minBucket == null) 0L else minBucket.count

  /** Unlink `n` from its bucket; drop the bucket if it empties. */
  private def removeFromBucket(n: Node): Unit = {
    val b = n.bucket
    if (n.prev != null) n.prev.next = n.next else b.head = n.next
    if (n.next != null) n.next.prev = n.prev else b.tail = n.prev
    n.prev = null; n.next = null; n.bucket = null
    if (b.head == null) {
      if (b.lower != null) b.lower.higher = b.higher
      if (b.higher != null) b.higher.lower = b.lower
      if (minBucket eq b) minBucket = b.higher
    }
  }

  /** Place `n` at count `c`, searching upward from `anchor` — the
    * highest bucket known to hold a count < c (null = start at the
    * bottom). Both call paths move to an adjacent count (+1 of an
    * existing counter), so the walk is a single hop: O(1). */
  private def placeNode(n: Node, c: Long, anchor: Bucket): Unit = {
    val above = if (anchor == null) minBucket else anchor.higher
    val target =
      if (above != null && above.count == c) above
      else {
        val b = new Bucket(c)
        b.lower = anchor
        b.higher = above
        if (anchor != null) anchor.higher = b else minBucket = b
        if (above != null) above.lower = b
        b
      }
    n.bucket = target
    n.count = c
    n.prev = null
    n.next = target.head
    if (target.head != null) target.head.prev = n
    target.head = n
    if (target.tail == null) target.tail = n
  }

  /** One observation of `key`: hit → O(1) bucket promotion; miss under
    * capacity → new count-1 counter; miss at capacity → evict the LRU
    * minimum counter, the newcomer inherits its count as the recorded
    * overestimate `err` (the Space-Saving invariant). */
  def offer(key: String): Unit = {
    val existing = map.get(key)
    if (existing != null) {
      val b = existing.bucket
      // anchor survives the detach: the bucket itself if other nodes
      // remain, else the bucket below it
      val anchor =
        if (existing.prev == null && existing.next == null) b.lower else b
      val c = existing.count + 1
      removeFromBucket(existing)
      placeNode(existing, c, anchor)
    } else if (map.size < capacity) {
      val n = new Node(key)
      map.put(key, n)
      placeNode(n, 1L, null)
    } else {
      val victim = minBucket.tail
      val vb = victim.bucket
      val anchor =
        if (victim.prev == null && victim.next == null) vb.lower else vb
      val vCount = victim.count
      map.remove(victim.key)
      removeFromBucket(victim)
      val n = new Node(key)
      n.err = vCount
      map.put(key, n)
      placeNode(n, vCount + 1, anchor)
    }
  }

  /** All counters, ranked count-desc with key tiebreak — deterministic
    * given the sketch contents. */
  def ranked: Seq[(String, Long, Long)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)](map.size)
    var b = minBucket
    while (b != null) {
      var n = b.head
      while (n != null) { out += ((n.key, n.count, n.err)); n = n.next }
      b = b.higher
    }
    out.sortBy { case (k, c, _) => (-c, k) }.toSeq
  }

  /** Mergeable-summaries combine (Agarwal et al. 2012): a key absent
    * from one side is counted at most that side's minimum counter — add
    * it as overestimate+err, keeping the overestimate-only invariant;
    * then truncate to capacity (count desc, key asc — deterministic
    * GIVEN the two inputs). O(capacity log capacity), and merges happen
    * only once per shuffled partial, never per row. */
  def mergeWith(other: StreamSummary): StreamSummary = {
    if (other.size == 0) return this
    if (size == 0) return other
    val minA = minCount
    val minB = other.minCount
    val mine = ranked.map { case (k, c, e) => k -> ((c, e)) }.toMap
    val theirs = other.ranked.map { case (k, c, e) => k -> ((c, e)) }.toMap
    val combined = (mine.keySet ++ theirs.keySet).iterator.map { k =>
      val (ca, ea) = mine.getOrElse(k, (minA, minA))
      val (cb, eb) = theirs.getOrElse(k, (minB, minB))
      (k, ca + cb, ea + eb)
    }.toSeq.sortBy { case (k, c, _) => (-c, k) }.take(capacity)
    val out = new StreamSummary(capacity)
    // bulk-load count-ascending so each placeNode anchors at the current
    // top bucket — O(1) per insert, no bucket-list walk
    var top: Bucket = null
    combined.reverseIterator.foreach { case (k, c, e) =>
      val n = new Node(k)
      n.err = e
      out.map.put(k, n)
      val anchor =
        if (top == null) null
        else if (top.count < c) top
        else top.lower // top.count == c: placeNode reuses anchor.higher
      out.placeNode(n, c, anchor)
      top = n.bucket
    }
    out
  }

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    out.writeInt(map.size)
    // flat entries, bucket-ascending, within-bucket tail→head (so the
    // head-inserting rebuild reproduces the original recency order)
    var b = minBucket
    while (b != null) {
      var n = b.tail
      while (n != null) {
        val bytes = n.key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(bytes.length)
        out.write(bytes)
        out.writeLong(n.count)
        out.writeLong(n.err)
        n = n.prev
      }
      b = b.higher
    }
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    map = new java.util.HashMap[String, Node]()
    minBucket = null
    val sz = in.readInt()
    var top: Bucket = null // highest bucket so far (entries ascend)
    var i = 0
    while (i < sz) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val k = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val c = in.readLong()
      val e = in.readLong()
      val n = new Node(k)
      n.err = e
      map.put(k, n)
      val anchor =
        if (top == null) null
        else if (top.count < c) top
        else top.lower // top.count == c: reuse via anchor.higher
      placeNode(n, c, anchor)
      top = n.bucket
      i += 1
    }
  }
}

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
  * key cardinality. The buffer is the mutable [[StreamSummary]] —
  * object aggregation keeps it a live JVM object per partition, so the
  * per-row path allocates nothing but the occasional Node.
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
    extends Aggregator[String, StreamSummary, Seq[(String, Long, Long)]] {

  override def zero: StreamSummary = new StreamSummary(capacity)

  override def reduce(buf: StreamSummary, key: String): StreamSummary = {
    buf.offer(key)
    buf
  }

  override def merge(a: StreamSummary, b: StreamSummary): StreamSummary =
    a.mergeWith(b)

  /** Emit count-desc (key tiebreak) so callers get ranked hitters. */
  override def finish(buf: StreamSummary): Seq[(String, Long, Long)] =
    buf.ranked

  override def bufferEncoder: Encoder[StreamSummary] =
    Encoders.javaSerialization[StreamSummary]
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object StreamSummary {
  // static (non-path-dependent) linked-structure cells: mergeWith builds
  // nodes it places into a DIFFERENT summary instance
  private[functions] final class Node(val key: String) {
    var count: Long = 0L
    var err: Long = 0L
    var bucket: Bucket = _
    var prev: Node = _ // within-bucket doubly-linked list
    var next: Node = _
  }

  private[functions] final class Bucket(val count: Long) {
    var lower: Bucket = _ // next-smaller count
    var higher: Bucket = _ // next-larger count
    var head: Node = _ // most-recently-touched
    var tail: Node = _ // LRU — the deterministic eviction victim
  }
}

object SpaceSaving {
  /** Column API: Space-Saving sketch of a STRING column. Returns
    * `array<struct<_1: key, _2: estimate, _3: err>>` ranked by estimate
    * desc. */
  def heavyHitters(c: Column, capacity: Int): Column =
    udaf(new SpaceSaving(capacity), Encoders.STRING).apply(c)
}
