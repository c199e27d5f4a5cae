package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup pipeline.
  *
  * Why custom: shingling + MinHash in pure `transform`/`aggregate` works
  * but higher-order lambdas are interpreted per element (no codegen) —
  * profiled at ~10s for 5k docs at sf0.1, which would be hours at 100 TB.
  * These expressions do the same work in one compiled JVM loop per row
  * (~50ms for the same input). This is the SURVEY §7 escape hatch:
  * "a custom Catalyst Expression only if codegen profiling demands it" —
  * it did.
  *
  * Both are deterministic pure functions of their input, so they are
  * partition-independent and safe under retries/speculation.
  */
object ShingleExpressions {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Affine mix parameters for the MinHash family, fixed seed. */
  private[functions] def mixParams(n: Int): (Array[Long], Array[Long]) = {
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = { // splitmix64 step
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.fill(n)(math.floorMod(next(), P - 1) + 1) // a in [1, P-1]
    val b = Array.fill(n)(math.floorMod(next(), P))
    (a, b)
  }

  /** Column API: distinct xxhash64 values of the k-word shingles of a
    * space-tokenized text column → array<long>. */
  def shingleHashes(text: Column, k: Int): Column =
    column(ShingleHashesExpr(expression(text), k))

  /** Column API: n-element MinHash signature of a shingle-hash array. */
  def minHashSignature(hashes: Column, n: Int): Column =
    column(MinHashSignatureExpr(expression(hashes), n))

  /** Column API: compiled sequential dot product of two numeric arrays. */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))
}

/** `shingle_hashes(text, k)`: split on single spaces, drop empty tokens,
  * hash each k-gram (joined with one space) with XXH64, return the
  * DISTINCT hash values. One compiled pass; no intermediate shingle
  * strings survive the row. */
case class ShingleHashesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val toks0 = input.asInstanceOf[UTF8String].toString.split(' ')
    val toks = new java.util.ArrayList[String](toks0.length)
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) toks.add(toks0(i)); i += 1
    }
    val n = toks.size
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j)); j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      seen.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dot_product(a, b)`: sequential-fold double dot product of two
  * numeric arrays (float inputs widened per element before multiplying —
  * the same arithmetic, in the same order, as the interpreted
  * `zip_with`+`aggregate` formulation and as DuckDB's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`, so oracle results are
  * bit-identical). Compiled loop instead of per-element lambda
  * interpretation — the vector ops' hot path. */
case class DotProductExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  // type dispatch once, not per row (this is the vector ops' hot path)
  @transient private lazy val aF = isFloatArr(left)
  @transient private lazy val bF = isFloatArr(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    // fail loudly on dimension mismatch rather than returning a
    // plausible-but-wrong partial dot product
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"dot_product: mismatched dimensions ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `minhash_signature(hashes, n)`: n minima of affine hash mixes
  * `((h mod P) * a_i + b_i) mod P` over the input hash array — the
  * standard universal-hash MinHash family, all n lanes updated in one
  * pass over the array. */
case class MinHashSignatureExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  private val (as, bs) = ShingleExpressions.mixParams(n)
  private val P = 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = math.floorMod(arr.getLong(i), P)
      var j = 0
      while (j < n) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
