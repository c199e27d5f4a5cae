package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic uniform group sampling via a bottom-k-by-hash sketch —
  * the engine's one custom `Aggregator` (the UDAF surface of SURVEY
  * §2-B; everything else is covered by built-ins).
  *
  * Keep the k smallest xxhash64 values per group: because the hash is a
  * uniform deterministic function of the value, the k smallest hashes
  * select a uniform random-LOOKING but fully reproducible sample —
  * unlike `df.sample`, whose RNG draw depends on partitioning. The
  * buffer is a bounded sorted array, so the sketch is constant-memory,
  * map-side combinable, and MERGEABLE (merge = merge-sort + truncate),
  * which is what makes it safe at any group size.
  */
class BottomKSample(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.empty[Long]

  /** Insert, keep the k smallest DISTINCT values (KMV semantics — a
    * repeated value must not crowd out the sample; array stays sorted,
    * length ≤ k). */
  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, v)
    if (i >= 0) return buf // already sampled
    if (buf.length == k && v >= buf(buf.length - 1)) return buf
    val idx = -(i + 1)
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, math.min(idx, n))
    if (idx < n) {
      out(idx) = v
      System.arraycopy(buf, idx, out, idx + 1, n - idx - 1)
    }
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge-sort with dedup, truncate at k
    val tmp = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < tmp.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (o == 0 || tmp(o - 1) != v) { tmp(o) = v; o += 1 }
    }
    if (o == tmp.length) tmp else java.util.Arrays.copyOf(tmp, o)
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object BottomKSample {
  /** Column API: bottom-k sketch of a LONG column (hash upstream for
    * uniform sampling: `bottomK(xxhash64(col), 8)`). */
  def bottomK(c: Column, k: Int): Column = udaf(new BottomKSample(k), Encoders.scalaLong).apply(c)
}
