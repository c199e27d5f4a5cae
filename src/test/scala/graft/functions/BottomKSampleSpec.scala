package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-algebra laws for the KMV bottom-k sample, property-tested:
  * a mergeable aggregate is only correct under Spark's execution model
  * if any split of the input into partial reductions merges to the same
  * result as a single sequential reduction — that is exactly what
  * map-side combine + shuffle merge assume. ScalaCheck generators with
  * a fixed seed (deterministic CI) driven from a plain ScalaTest loop,
  * same pattern as SerdeSpec.
  */
class BottomKSampleSpec extends AnyFunSuite {

  private val k = 8
  private def agg = new BottomKSample(k)

  private def reduceAll(xs: Seq[Long]): Array[Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  private def exact(xs: Seq[Long]): Seq[Long] =
    xs.distinct.sorted.take(k)

  private val genWide = Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
  // duplicate-heavy inputs exercise the KMV distinctness path
  private val genDup = Gen.listOf(Gen.chooseNum(-5L, 5L))

  private def samples(g: Gen[List[Long]], n: Int): Seq[List[Long]] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("sequential reduction equals exact k smallest distinct values") {
    (samples(genWide, 100) ++ samples(genDup, 100)).foreach { xs =>
      assert(reduceAll(xs).toSeq === exact(xs), s"input: $xs")
    }
  }

  test("any split + merge equals the sequential reduction") {
    (samples(genWide, 100) ++ samples(genDup, 100)).zipWithIndex.foreach {
      case (xs, i) =>
        val cut = if (xs.isEmpty) 0 else i % (xs.size + 1)
        val (a, b) = xs.splitAt(cut)
        assert(agg.merge(reduceAll(a), reduceAll(b)).toSeq === exact(xs),
          s"split at $cut of $xs")
    }
  }

  test("merge is commutative and respects the k bound") {
    samples(genDup, 100).zip(samples(genDup, 100).reverse).foreach {
      case (xs, ys) =>
        val m1 = agg.merge(reduceAll(xs), reduceAll(ys))
        val m2 = agg.merge(reduceAll(ys), reduceAll(xs))
        assert(m1.toSeq === m2.toSeq)
        assert(m1.length <= k)
        assert(m1.toSeq === exact(xs ++ ys), s"xs=$xs ys=$ys")
    }
  }
}
