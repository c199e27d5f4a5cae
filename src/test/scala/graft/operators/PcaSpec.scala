package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-axis guarantees for `emb_pca_top` (no oracle: iterative
  * eigensolve). The fixture embeds a dominant direction with known
  * per-vector coefficients, so the recovered eigenvector, the sign
  * convention, and the outlier ranking are all checkable exactly-ish.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** vec i = t(i)·u + small deterministic off-axis noise, where u is a
    * unit vector concentrated on axes 1 and 3 and t spans ±5. */
  private def planted(n: Int): org.apache.spark.sql.DataFrame = {
    val u = Array(0.0, 0.8, 0.0, 0.6, 0.0, 0.0, 0.0, 0.0)
    val rows = (0 until n).map { i =>
      val t = (i - n / 2).toDouble * 10.0 / n
      val noise = (0 until dim).map(d => ((i * 7 + d * 13) % 5 - 2) * 0.01)
      (i.toLong, (0 until dim).map(d => (t * u(d) + noise(d)).toFloat).toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("emb_pca_top: recovers the planted dominant axis and ranks the extremes first") {
    val out = VectorOps.pcaTop(planted(200), dim = dim, topK = 10).collect()
    assert(out.length == 10)
    // the planted coefficients are largest at the ends of the id range,
    // so the top-|score| list must come from the extremes
    val ids = out.map(_.getLong(0)).toSet
    val extremes = ((0L to 9L) ++ (190L to 199L)).toSet
    assert(ids.subsetOf(extremes), s"top-10 ids $ids not in the extremes")
    // eigenvalue ≈ var(t)·|u|² ≈ var(t) = (10/200)²·Σ(i−100)²/200 ≈ 8.35;
    // loose band — noise and truncation shift it slightly
    val eig = out.head.getLong(2) / 1e6
    assert(eig > 5.0 && eig < 12.0, s"eigenvalue $eig outside the band")
  }

  test("emb_pca_top: the sign convention is deterministic (largest axis positive)") {
    // u's largest |coordinate| is axis 1 (0.8): the convention makes it
    // positive, so the highest-t vector (vec_id n−1) must score POSITIVE
    val out = VectorOps.pcaTop(planted(200), dim = dim, topK = 10).collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hi = byId.keys.max
    assert(hi >= 190L && byId(hi) > 0,
      s"highest-t vector must project positive, got ${byId(hi)}")
  }

  test("emb_pca_top: scores are the centered projection (mean shift applied)") {
    // shift every vector by a constant offset along axis 0: scores must
    // be unchanged (centering removes the constant)
    val base = planted(100)
    val shifted = base.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x + lit(3.0f)).otherwise(x)).as("embedding"))
    val a = VectorOps.pcaTop(base, dim = dim, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = VectorOps.pcaTop(shifted, dim = dim, topK = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // covariance is shift-invariant, so the PC and the centered scores
    // agree to quantization (cov_micro truncation can move a score by
    // a few micro-units)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, sa), (_, sb)) =>
      assert(math.abs(sa - sb) <= 2000L, s"score drifted: $sa vs $sb")
    }
  }
}
