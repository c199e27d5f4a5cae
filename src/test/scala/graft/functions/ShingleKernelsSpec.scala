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

  test("simhash is deterministic and insensitive to leading/trailing/multiple spaces") {
    texts(100).foreach { t =>
      val h1 = ShingleKernels.simHash64(UTF8String.fromString(t))
      val h2 = ShingleKernels.simHash64(UTF8String.fromString("  " + t.replace(" ", "  ") + " "))
      assert(h1 === h2, s"text: '$t'")
    }
  }
}
