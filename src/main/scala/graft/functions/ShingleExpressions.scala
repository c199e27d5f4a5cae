package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup/similarity pipeline.
  *
  * Why custom: shingling + MinHash in pure `transform`/`aggregate` works
  * but higher-order lambdas are interpreted per element (no codegen) —
  * profiled at ~10s for 5k docs at sf0.1, which would be hours at 100 TB.
  * These expressions do the same work in one compiled JVM loop per row
  * (~50ms for the same input).
  *
  * All four implement `doGenCode`, so they participate in whole-stage
  * codegen instead of breaking the fused pipeline with a CodegenFallback
  * (round-1 state): the generated code calls straight into the static
  * kernels below (`ShingleKernels`), keeping the surrounding operators in
  * one generated loop. This is the SURVEY §7 escape hatch: "a custom
  * Catalyst Expression only if codegen profiling demands it" — it did.
  *
  * All are deterministic pure functions of their input, so they are
  * partition-independent and safe under retries/speculation.
  */
object ShingleExpressions {

  val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Affine mix parameters for the MinHash family, fixed seed. PUBLIC:
    * [[graft.OracleGen.nearMinhashSql]] inlines these constants into
    * generated DuckDB SQL — single source of truth for both engines. */
  def mixParams(n: Int): (Array[Long], Array[Long]) = {
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

  /** Column API: per-OCCURRENCE packed word hashes (no distinct) —
    * the occurrence-statistics sibling of [[shingleHashes]] (r15:
    * DSIR-style bucket counts need counts, not sets). */
  def wordHashes(text: Column): Column =
    column(WordHashesExpr(expression(text)))

  /** Column API: per-OCCURRENCE packed k-gram hashes (no distinct) —
    * see [[ShingleKernels.gramHashes]]. */
  def gramHashes(text: Column, k: Int): Column =
    column(GramHashesExpr(expression(text), k))

  /** Column API: n-element MinHash signature of a shingle-hash array. */
  def minHashSignature(hashes: Column, n: Int): Column =
    column(MinHashSignatureExpr(expression(hashes), n))

  /** Column API: compiled sequential dot product of two numeric arrays. */
  def dotProduct(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))

  /** Column API: partial dot products of two numeric arrays at each
    * prefix checkpoint — ONE compiled traversal emitting
    * `array(dot(a[0:c₁], b[0:c₁]), …)`; each element is bit-identical
    * to the full sequential dot of the sliced prefixes (a prefix of a
    * left-to-right fold IS the fold of the prefix). */
  def prefixDots(a: Column, b: Column, checkpoints: Seq[Int]): Column =
    column(PrefixDotsExpr(expression(a), expression(b), checkpoints))

  /** Column API: 64-bit SimHash of a space-tokenized text column. */
  def simHash64(text: Column): Column =
    column(SimHash64Expr(expression(text)))

  /** Column API: ALL k-gram strings (with multiplicity) of a
    * space-tokenized text column → array<string>. */
  def ngrams(text: Column, k: Int): Column =
    column(NgramsExpr(expression(text), k))

  /** Column API: Rabin-Karp polynomial fingerprint — word-level rolling
    * hash (`wordLevel = true`) or raw codepoint rolling hash. */
  def rabinFingerprint(text: Column, wordLevel: Boolean): Column =
    column(RabinFingerprintExpr(expression(text), wordLevel))

  /** Column API: windowed co-occurrence pair hashes →
    * array<struct<h1: long, h2: long>> (see
    * [[ShingleKernels.cooccurPairs]]). */
  def cooccurPairs(text: Column, win: Int): Column =
    column(CooccurPairsExpr(expression(text), win))
}

/** Static kernels shared by the interpreted (`nullSafeEval`) and generated
  * (`doGenCode`) paths. Top-level Scala object → the compiler emits static
  * forwarders, so janino-generated Java calls these directly with no
  * reference-object indirection. */
object ShingleKernels {

  /** `x mod P` for any x in [0, 2⁶³) without a division: P = 2³¹−1 is
    * Mersenne, so 2³¹ ≡ 1 (mod P) and x ≡ (x & P) + (x >>> 31). Two
    * folds bring the value under P + 4; one conditional subtract lands
    * in [0, P). Bit-identical to `% P` (the generated DuckDB oracles
    * keep using `%` and still hash-match) at ~5 cycles instead of the
    * ~25-cycle 64-bit division the hot loops were paying per codepoint.
    * Every call site's operand is provably nonnegative and < 2⁶³:
    * accumulators stay in [0, P) and multipliers are < 2³². */
  @inline private def modP(x: Long): Long = {
    val P = ShingleExpressions.P
    val s = (x & P) + (x >>> 31)
    val t = (s & P) + (s >>> 31)
    if (t >= P) t - P else t
  }

  /** Codepoint polynomial over a string: a₀ = init, a = (a·mult + cp)
    * mod P — the SQL-reproducible hash primitive shared by the shingle,
    * fingerprint, and simhash kernels (ord() + list_reduce replays it
    * exactly in DuckDB). */
  private def polyHash(s: CharSequence, init: Long, mult: Long): Long = {
    var a = init
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = Character.codePointAt(s, i)
      a = modP(a * mult + cp)
      i += Character.charCount(cp)
    }
    a
  }

  /** Split on single spaces, drop empty tokens, hash each k-gram (joined
    * with one space), return the DISTINCT hash values. One pass; no
    * intermediate shingle strings survive the row.
    *
    * The hash is DELIBERATELY not XXH64 (the round-4 form): two
    * independent codepoint polynomials mod P = 2³¹−1 (inits 7/11, mults
    * 31/131) packed as `h₁·2³¹ + h₂` — a 62-bit value DuckDB reproduces
    * exactly with ord() + list_reduce, which is what lets
    * `dedup_near_minhash` / `dedup_minhash_clusters` be hash-oracled
    * ([[graft.OracleGen.nearMinhashSql]]). 62 bits keep the collision
    * tail ~n²/2⁶² — indistinguishable from the old 64-bit XXH64 in
    * practice (a single 31-bit polynomial would collide ~500× at a
    * 1.5M-shingle corpus and silently merge distinct shingles). */
  def shingleHashes(input: UTF8String, k: Int): ArrayData = {
    val toks0 = input.toString.split(' ')
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
      val h = (polyHash(sb, 7L, 31L) << 31) | polyHash(sb, 11L, 131L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Per-OCCURRENCE single-word hashes of a space-tokenized text — the
    * [[shingleHashes]] 62-bit double-poly packing WITHOUT the distinct
    * (occurrence statistics like DSIR bucket counts need every token).
    * Same SQL replay: `shingleHashSql(word)` per unnested word
    * ([[graft.OracleGen]]); replaced dsir_weights' md5-hex+conv per
    * token, whose hex-string parse dominated the sf10 tokenization. */
  def wordHashes(input: UTF8String): ArrayData = gramHashes(input, 1)

  /** Per-OCCURRENCE k-gram hashes (no distinct) — the occurrence-counts
    * sibling of [[shingleHashes]]: text_lm_score's bigram frequencies
    * need EVERY gram instance, where the set form would collapse
    * within-doc repeats. Replaces the string-gram + xxhash64 pass whose
    * per-gram string materialization dominated at sf10; hash equality
    * (all either engine's count joins consume) is preserved modulo the
    * same 62-bit collision tail as the shingle family. */
  def gramHashes(input: UTF8String, k: Int): ArrayData = {
    val toks0 = input.toString.split(' ')
    val toks = new java.util.ArrayList[String](toks0.length)
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) toks.add(toks0(i)); i += 1
    }
    val n = toks.size
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j)); j += 1
      }
      out(i) = (polyHash(sb, 7L, 31L) << 31) | polyHash(sb, 11L, 131L)
      i += 1
    }
    new GenericArrayData(out)
  }

  // (a, b) affine-mix parameter pairs per signature width, computed once
  // per JVM — generated code can't close over driver state, so the lookup
  // lives here instead of in the expression instance
  private val mixCache = new ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def mix(n: Int): (Array[Long], Array[Long]) =
    mixCache.computeIfAbsent(n, ShingleExpressions.mixParams(_))

  /** n minima of affine hash mixes `((h mod P) * a_i + b_i) mod P` over
    * the input hash array — the standard universal-hash MinHash family,
    * all n lanes updated in one pass over the array. */
  def minHash(arr: ArrayData, n: Int): ArrayData = {
    val (as, bs) = mix(n)
    val P = ShingleExpressions.P
    val m = arr.numElements()
    val mins = Array.fill(n)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val g = arr.getLong(i)
      // our shingle hashes are 62-bit nonnegative (fold applies); keep
      // the floorMod fallback for arbitrary caller-supplied longs
      val h = if (g >= 0) modP(g) else math.floorMod(g, P)
      var j = 0
      while (j < n) {
        val v = modP(h * as(j) + bs(j))
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-16-bit-lane multiplicative mixers for [[simHash64]]'s token
    * hash (the four xxhash/Knuth 32-bit primes — any odd well-mixed
    * constants < 2³² work; these are pinned because the generated DuckDB
    * oracle inlines them). */
  val SimMixers: Array[Long] =
    Array(2654435761L, 1597334677L, 2246822519L, 3266489917L)

  /** 64-bit SimHash: every token occurrence (NOT deduped — frequency is
    * signal here, unlike shingles) votes ±1 on each bit of its 64-bit
    * token hash; the packed sign vector is the fingerprint. The token
    * hash is DELIBERATELY not XXH64 (the round-4 form): it is the same
    * codepoint polynomial as [[rabinWords]] — `a = (a·31 + cp) mod P`,
    * a₀ = 7, P = 2³¹−1 — expanded to 64 bits by the four multiplicative
    * mixes `h_j = (a · SimMixers(j)) mod P`, with bit b of the token hash
    * = bit (b mod 16) of `h_(b div 16)`. Every step is plain integer
    * arithmetic on Unicode codepoints (nothing exceeds 2⁶³), so the
    * DuckDB oracle reproduces the fingerprint EXACTLY via ord() +
    * list_reduce ([[graft.OracleGen.simhashSql]]) — which upgrades
    * `dedup_simhash` / `dedup_simhash_pairs` from spec-only to
    * hash-oracled. One pass, 64 accumulators. */
  def simHash64(input: UTF8String): Long = {
    val s = input.toString
    val votes = new Array[Int](64)
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var a = 7L
        while (i < n && s.charAt(i) != ' ') {
          val cp = s.codePointAt(i)
          a = modP(a * 31L + cp)
          i += Character.charCount(cp)
        }
        // nonlinear scramble before the per-lane mixes: squaring mod P
        // kills the linear differentials of the polynomial (similar
        // tokens — shared prefixes, digit suffixes — otherwise leave
        // vote margins correlated and near zero, doubling bit flips per
        // token change); still plain 63-bit-safe integer arithmetic the
        // SQL oracle reproduces
        val sq = modP(a * a)
        var j = 0
        while (j < 4) {
          val h = modP(sq * SimMixers(j))
          var k = 0
          while (k < 16) {
            if (((h >>> k) & 1L) == 1L) votes(j * 16 + k) += 1
            else votes(j * 16 + k) -= 1
            k += 1
          }
          j += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Rabin-Karp rolling fingerprint over the space-tokenized word stream:
    * per word a = 7, a = (a*31 + codepoint) mod P; per document h = 5381,
    * h = (h*33 + wordHash) mod P. Modular at every step so the fold can
    * never overflow under ANSI arithmetic — and, deliberately, every
    * operation is plain integer arithmetic on Unicode CODEPOINTS, so the
    * DuckDB oracle reproduces it exactly with ord() + list_reduce (unlike
    * the round-2 crc32 formulation, which no other engine shares). */
  def rabinWords(input: UTF8String): Long = {
    val s = input.toString
    var h = 5381L
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i < n) {
        var a = 7L
        while (i < n && s.charAt(i) != ' ') {
          val cp = s.codePointAt(i)
          a = modP(a * 31L + cp)
          i += Character.charCount(cp)
        }
        h = modP(h * 33L + a)
      }
    }
    h
  }

  /** Rabin-Karp rolling hash over ALL codepoints (spaces included) — the
    * content-hash sibling of [[rabinWords]]. */
  def rabinChars(input: UTF8String): Long = {
    val s = input.toString
    var a = 7L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      a = modP(a * 31L + cp)
      i += Character.charCount(cp)
    }
    a
  }

  /** Windowed co-occurrence pair hashes (r14, the `text_cooccur_pmi`
    * inner loop compiled): for tokens t_i, every (t_i, t_{i+j}) with
    * 1 ≤ j ≤ win becomes one (h1, h2) = (min, max) of the two token
    * hashes — EXACTLY the interpreted
    * `flatten(transform(hs, (h,i) => transform(slice(...), ...)))`
    * chain it replaces (HOFs never enter whole-stage codegen). Token
    * hashes are Spark's own xxhash64 (XXH64, seed 42) over each
    * token's byte range — byte-exact with `xxhash64(word)` on the
    * split tokens, because the ASCII space byte never occurs inside a
    * multibyte UTF-8 sequence — so the vocabulary dictionary keyed by
    * `xxhash64(word)` joins back unchanged. Zero string allocation:
    * tokens are hashed in place from the input's backing bytes. */
  def cooccurPairs(input: UTF8String, win: Int): ArrayData = {
    val base = input.getBaseObject
    val off = input.getBaseOffset
    val n = input.numBytes
    // tokenize on the space BYTE: (start, len) ranges, empties dropped
    var nt = 0
    var hs = new Array[Long](16)
    var i = 0
    while (i < n) {
      while (i < n && org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) i += 1
      if (i < n) {
        val start = i
        while (i < n && org.apache.spark.unsafe.Platform.getByte(base, off + i) != 0x20) i += 1
        if (nt == hs.length) hs = java.util.Arrays.copyOf(hs, nt * 2)
        hs(nt) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + start, i - start, 42L)
        nt += 1
      }
    }
    var m = 0
    i = 0
    while (i < nt) { m += math.min(win, nt - 1 - i); i += 1 }
    val out = new Array[Any](m)
    var idx = 0
    i = 0
    while (i < nt) {
      var j = 1
      while (j <= win && i + j < nt) {
        val a = hs(i); val b = hs(i + j)
        out(idx) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](math.min(a, b), math.max(a, b)))
        idx += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All k-grams of the space-tokenized input as strings, WITH
    * multiplicity (frequency statistics need every occurrence; dedup
    * signatures use the distinct hashed variant above). */
  def ngrams(input: UTF8String, k: Int): ArrayData = {
    val toks0 = input.toString.split(' ')
    val toks = new java.util.ArrayList[String](toks0.length)
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) toks.add(toks0(i)); i += 1
    }
    val n = toks.size
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j)); j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingle_hashes(text, k)` — see [[ShingleKernels.shingleHashes]]. */
case class ShingleHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.shingleHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `gram_hashes(text, k)` — see [[ShingleKernels.gramHashes]]. */
case class GramHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.gramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_hashes(text)` — see [[ShingleKernels.wordHashes]]. */
case class WordHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.wordHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.wordHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `rabin_fingerprint(text, wordLevel)` — see
  * [[ShingleKernels.rabinWords]] / [[ShingleKernels.rabinChars]]. */
case class RabinFingerprintExpr(child: Expression, wordLevel: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rabin_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    if (wordLevel) ShingleKernels.rabinWords(input.asInstanceOf[UTF8String])
    else ShingleKernels.rabinChars(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = if (wordLevel) "rabinWords" else "rabinChars"
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.$kernel($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dot_product(a, b)`: sequential-fold double dot product of two
  * numeric arrays (float inputs widened per element before multiplying —
  * the same arithmetic, in the same order, as the interpreted
  * `zip_with`+`aggregate` formulation and as DuckDB's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`, so oracle results are
  * bit-identical). The generated code is a straight primitive loop fused
  * into whole-stage codegen — the vector ops' hot path. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  // type dispatch once (at codegen/plan time), not per row
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (aF) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (bF) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot_product: mismatched dimensions " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($getA) * ($getB);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Partial dot products at ascending prefix `checkpoints` in ONE array
  * traversal — the Matryoshka-truncation scorer. Replaces the
  * slice-per-prefix form (4 prefixes × 3 dots × 2 slices = up to 24
  * array allocations per candidate row, measured 467 s at sf10) with a
  * single allocation-free fold that records the running sum as it
  * passes each checkpoint. Element i equals `DotProductExpr(slice(a,
  * 1, cᵢ), slice(b, 1, cᵢ))` bit-for-bit: a prefix of a sequential
  * left-to-right fold is the fold of the prefix. Fails loudly when an
  * input is shorter than the last checkpoint (the dimension-mismatch
  * rule above) rather than returning a plausible partial. */
case class PrefixDotsExpr(left: Expression, right: Expression,
                          checkpoints: Seq[Int])
    extends BinaryExpression {
  require(checkpoints.nonEmpty && checkpoints.head > 0 &&
    checkpoints.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
    s"prefix_dots: checkpoints must be positive ascending, got $checkpoints")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }
  @transient private lazy val aF = isFloatArr(left)
  @transient private lazy val bF = isFloatArr(right)
  @transient private lazy val cpArr = checkpoints.toArray

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val out = PrefixDotsKernel.compute(a, b, cpArr, aF, bF)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cpRef = ctx.addReferenceObj("checkpoints", cpArr, "int[]")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PrefixDotsKernel.compute($a, $b, $cpRef, $aF, $bF));
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static kernel shared by PrefixDotsExpr's interpreted and generated
  * paths — one fold, sums recorded at each checkpoint. */
object PrefixDotsKernel {
  def compute(a: ArrayData, b: ArrayData, cps: Array[Int],
              aF: Boolean, bF: Boolean): Array[Double] = {
    val n = a.numElements()
    val last = cps(cps.length - 1)
    if (b.numElements() != n || n < last) throw new IllegalArgumentException(
      s"prefix_dots: need two length->=$last arrays, got $n vs ${b.numElements()}")
    val out = new Array[Double](cps.length)
    var acc = 0.0
    var i = 0
    var c = 0
    while (c < cps.length) {
      val stop = cps(c)
      while (i < stop) {
        val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      out(c) = acc
      c += 1
    }
    out
  }
}

/** `minhash_signature(hashes, n)` — see [[ShingleKernels.minHash]]. */
case class MinHashSignatureExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.minHash(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.minHash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)` — see [[ShingleKernels.simHash64]]. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ngrams(text, k)` — see [[ShingleKernels.ngrams]]. */
/** `cooccur_pairs(text, win)` — see [[ShingleKernels.cooccurPairs]]. */
case class CooccurPairsExpr(child: Expression, win: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    new org.apache.spark.sql.types.StructType()
      .add("h1", org.apache.spark.sql.types.LongType, nullable = false)
      .add("h2", org.apache.spark.sql.types.LongType, nullable = false),
    containsNull = false)
  override def prettyName: String = "cooccur_pairs"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.cooccurPairs(input.asInstanceOf[UTF8String], win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernels.cooccurPairs($c, $win)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NgramsExpr(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "ngrams"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKernels.ngrams(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernels.ngrams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
