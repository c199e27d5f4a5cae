package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Algebraic laws of the compiled dedup kernels, property-tested with
  * fixed-seed generators (same pattern as SerdeSpec/BottomKSampleSpec).
  * The union law is the one that matters at scale: it is what makes
  * MinHash signatures mergeable across partitions/documents. */
class ShingleKernelsSpec extends AnyFunSuite {

  private def longs(a: Any): Seq[Long] =
    a.asInstanceOf[GenericArrayData].array.toSeq.map(_.asInstanceOf[Long])

  private val genText: Gen[String] =
    Gen.listOf(Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "yy", "zzz"))
      .map(_.mkString(" "))

  private def texts(n: Int): Seq[String] =
    (0 until n).flatMap(i => genText.apply(Gen.Parameters.default, Seed(7L + i)))

  test("ngrams count = max(0, tokens - k + 1); shingleHashes = distinct ngram hashes") {
    texts(200).foreach { t =>
      val toks = t.split(' ').count(_.nonEmpty)
      val grams = ShingleKernels.ngrams(UTF8String.fromString(t), 3).numElements()
      assert(grams === math.max(0, toks - 3 + 1), s"text: '$t'")
      val sh = longs(ShingleKernels.shingleHashes(UTF8String.fromString(t), 3))
      assert(sh.distinct === sh, "shingle hashes must be distinct")
      assert(sh.size <= math.max(0, toks - 3 + 1))
    }
  }

  test("minhash union law: sig(A ∪ B) = elementwise min of sig(A), sig(B)") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    (0 until 100).foreach { i =>
      val a = gen.apply(Gen.Parameters.default, Seed(100L + i)).get
      val b = gen.apply(Gen.Parameters.default, Seed(500L + i)).get
      val sa = longs(ShingleKernels.minHash(new GenericArrayData(a.toArray), 16))
      val sb = longs(ShingleKernels.minHash(new GenericArrayData(b.toArray), 16))
      val su = longs(ShingleKernels.minHash(new GenericArrayData((a ++ b).toArray), 16))
      assert(su === sa.zip(sb).map { case (x, y) => math.min(x, y) })
    }
  }

  test("rabin fingerprints: hand-computed values, space normalization, order sensitivity") {
    val P = 2147483647L
    def rw(s: String): Long = {
      var h = 5381L
      s.split(' ').filter(_.nonEmpty).foreach { w =>
        var a = 7L
        w.codePoints().forEach(cp => a = (a * 31L + cp) % P)
        h = (h * 33L + a) % P
      }
      h
    }
    texts(100).foreach { t =>
      assert(ShingleKernels.rabinWords(UTF8String.fromString(t)) === rw(t), s"'$t'")
    }
    val ab = ShingleKernels.rabinWords(UTF8String.fromString("alpha beta"))
    // word-level hash ignores the amount of whitespace between words...
    assert(ShingleKernels.rabinWords(UTF8String.fromString(" alpha  beta ")) === ab)
    // ...but is order-sensitive
    assert(ShingleKernels.rabinWords(UTF8String.fromString("beta alpha")) !== ab)
    // char-level hash sees every codepoint, including spaces
    assert(ShingleKernels.rabinChars(UTF8String.fromString("ab")) ===
      (((7L * 31 + 'a') % P) * 31 + 'b') % P)
    assert(ShingleKernels.rabinChars(UTF8String.fromString("a b")) !==
      ShingleKernels.rabinChars(UTF8String.fromString("ab")))
    // non-BMP codepoints count once (surrogate pair = one codepoint)
    val emoji = new String(Character.toChars(0x1F600))
    assert(ShingleKernels.rabinChars(UTF8String.fromString(emoji)) ===
      (7L * 31 + 0x1F600) % P)
  }

  test("simhash is deterministic and insensitive to leading/trailing/multiple spaces") {
    texts(100).foreach { t =>
      val h1 = ShingleKernels.simHash64(UTF8String.fromString(t))
      val h2 = ShingleKernels.simHash64(UTF8String.fromString("  " + t.replace(" ", "  ") + " "))
      assert(h1 === h2, s"text: '$t'")
    }
  }

  test("prefixDots law: element i is BIT-IDENTICAL to the sequential dot of the sliced prefixes") {
    // the Matryoshka scorer's correctness hinges on "a prefix of a
    // left-to-right fold is the fold of the prefix" — pin it against
    // the single-dot kernel over explicit prefixes, including
    // cancellation-heavy values where fold order changes bits
    val gen = Gen.listOfN(64, Gen.chooseNum(-1e6f, 1e6f))
    val cps = Array(1, 8, 16, 32, 64)
    (0 until 200).foreach { i =>
      val a = gen.apply(Gen.Parameters.default, Seed(900L + i)).get.toArray
      val b = gen.apply(Gen.Parameters.default, Seed(1900L + i)).get.toArray
      val ad = new GenericArrayData(a)
      val bd = new GenericArrayData(b)
      val got = PrefixDotsKernel.compute(ad, bd, cps, aF = true, bF = true)
      cps.zipWithIndex.foreach { case (c, j) =>
        var acc = 0.0
        var k = 0
        while (k < c) { acc += a(k).toDouble * b(k).toDouble; k += 1 }
        // bit-level equality, not approximate: the oracle compares
        // exact doubles after DuckDB computes the same slice fold
        assert(java.lang.Double.doubleToRawLongBits(got(j)) ===
          java.lang.Double.doubleToRawLongBits(acc), s"i=$i checkpoint=$c")
      }
    }
    // shorter-than-last-checkpoint input fails loudly, never partial
    val short = new GenericArrayData(Array.fill(8)(1.0f))
    intercept[IllegalArgumentException] {
      PrefixDotsKernel.compute(short, short, cps, aF = true, bF = true)
    }
  }
}
