package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed Bloom filter over pre-hashed 64-bit keys (Bloom 1970;
  * position derivation via Kirsch–Mitzenmacher double hashing, "Less
  * Hashing, Same Performance", 2006): the mergeable membership sketch
  * behind cross-shard dedup pre-filters — shard A publishes a
  * `m`-bit filter (128 KB at 2^20 bits) instead of its full key set, and
  * shard B drops definite-non-members locally before any shuffle or
  * join. No false negatives ever; false positives at the standard
  * (1 − e^(−kn/m))^k rate, so the filter only ever sends EXTRA
  * candidates to the exact verifier, never loses a duplicate.
  *
  * The k probe positions are derived identically in the aggregator
  * (JVM long math) and in [[BloomFilter.mightContainExpr]] (Catalyst SQL
  * — codegen'd, no UDF in the probe path): h1 = hash masked to 62 bits,
  * h2 = (hash >>> 32) | 1, pos_i = (h1 + i·h2) & (m−1). The 62-bit mask
  * keeps every addition inside the long range — Spark 4 runs ANSI mode,
  * where a raw h1 + i·h2 overflow would THROW, not wrap.
  *
  * Buffer = one Array[Long] bitset per partition, merged by OR — the
  * shuffle ships m/8 bytes per partition regardless of key count, the
  * same constant-width contract as [[SpaceSaving]].
  */
class BloomFilterAgg(bitsLog2: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(bitsLog2 >= 6 && bitsLog2 <= 30, s"bitsLog2 out of range: $bitsLog2")
  require(k >= 1 && k <= 16, s"k out of range: $k")
  private val mask = (1L << bitsLog2) - 1L

  override def zero: Array[Long] = new Array[Long](1 << (bitsLog2 - 6))

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val h1 = v & BloomFilter.SixtyTwoBits
    val h2 = (v >>> 32) | 1L
    var i = 0
    while (i < k) {
      val pos = (h1 + i * h2) & mask
      buf((pos >>> 6).toInt) |= 1L << (pos & 63L).toInt
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomFilter {
  private[functions] val SixtyTwoBits = (1L << 62) - 1L

  /** Aggregate a LONG (pre-hashed) column into an `array<bigint>` Bloom
    * bitset of 2^bitsLog2 bits. */
  def agg(c: Column, bitsLog2: Int, k: Int): Column =
    udaf(new BloomFilterAgg(bitsLog2, k), Encoders.scalaLong).apply(c)

  /** SQL predicate string testing `hashCol` against the bitset in
    * `bloomCol` — pure Catalyst expressions (shiftright/element_at/
    * bitwise-and), whole-stage-codegen'd, probe math identical to the
    * aggregator's. Use with `selectExpr`/`expr`. */
  def mightContainExpr(bloomCol: String, hashCol: String,
                       bitsLog2: Int, k: Int): String = {
    val mask = (1L << bitsLog2) - 1L
    val h1 = s"($hashCol & ${SixtyTwoBits}L)"
    val h2 = s"(shiftrightunsigned($hashCol, 32) | 1L)"
    (0 until k).map { i =>
      val pos = s"(($h1 + ${i}L * $h2) & ${mask}L)"
      s"((shiftright(element_at($bloomCol, CAST(shiftright($pos, 6) AS INT) + 1), " +
        s"CAST(($pos & 63L) AS INT)) & 1L) = 1L)"
    }.mkString("(", " AND ", ")")
  }
}
