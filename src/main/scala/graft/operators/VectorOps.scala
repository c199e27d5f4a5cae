package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector / embedding operators over `embeddings` (`embedding:
  * array<float>` dim 64). Dot products use higher-order functions
  * (`zip_with` + `aggregate`) — codegen'd, no UDF, no shuffle for the
  * scoring pass. Floats are widened to double *before* multiplying so the
  * arithmetic matches the DuckDB oracle (`embedding::DOUBLE[]`) bit-for-bit.
  */
object VectorOps {

  /** Sequential-fold dot product of two array<float|double> columns —
    * compiled custom expression (same arithmetic order as the HOF
    * `zip_with`+`aggregate` form and DuckDB's list_dot_product on
    * DOUBLE[], so oracle results stay bit-identical). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ShingleExpressions.dotProduct(a, b)

  /** Zero-norm vectors yield NULL (excluded by top-k ordering and
    * threshold filters) instead of an ANSI DIVIDE_BY_ZERO abort. */
  def cosine(a: Column, b: Column): Column = {
    val den = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(den === 0, lit(null)).otherwise(dot(a, b) / den)
  }

  /** `fn_array`: array ops — size, element access (front/back), norm. */
  def fnArray(embeddings: DataFrame): DataFrame =
    embeddings
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("first_elem"),
        element_at(col("embedding"), -1).cast("double").as("last_elem"),
        round(dot(col("embedding"), col("embedding")), 4).as("norm_sq"))
      .orderBy("vec_id")

  /** `sim_cosine_topk`: exact top-k cosine neighbors of a probe vector —
    * the brute-force ANN baseline. The probe is a 1-row broadcast; scoring
    * is a map-only pass over the corpus; top-k is TakeOrdered (per-partition
    * heaps, no global sort). This is exactly the plan you want at 100 TB for
    * a single probe; for probe *batches*, see `annLsh`. */
  def cosineTopK(embeddings: DataFrame, probeId: Long = 0L, k: Int = 10): DataFrame = {
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    embeddings
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  /** Random-hyperplane (sign) LSH bucketing: `nBits` fixed pseudo-random
    * hyperplanes → one integer bucket per vector. Deterministic planes are
    * derived from a hash of (plane index, dimension index) — no RNG state,
    * so executors regenerate identical planes with no driver broadcast. */
  private def signBucket(v: Column, dim: Int, nBits: Int, seed: Int = 0): Column = {
    // plane(p)[d] = a deterministic pseudo-random value in [-1, 1);
    // materialized as ONE array literal per plane (typedlit) and folded
    // with zip_with/aggregate so codegen stays compact — an unrolled
    // 64-term sum per plane overflows the JVM's 64KB method limit.
    def plane(p: Int): Column = {
      val coeffs: Seq[Double] = (0 until dim).map { d =>
        val h = (((p + seed) * 1315423911L) ^ (d * 2654435761L)) * 40503L
        ((h % 2000003L).toDouble / 1000001.5) - 1.0 // [-1,1)
      }
      dot(v, typedlit(coeffs))
    }
    (0 until nBits)
      .map(p => when(plane(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** `sim_ann_lsh`: approximate top-k via banded sign-LSH — the scale
    * path (OR-amplification: `nBands` independent bucket tables, a
    * candidate matches the probe in ANY band). Only same-bucket candidates
    * are scored, turning the full scan into a bucket-equi join; recall vs
    * candidate-set size is tuned by (nBands, bitsPerBand). No oracle
    * (approximate); ScalaTest asserts recall against the exact baseline. */
  def annLsh(embeddings: DataFrame, probeId: Long = 0L, k: Int = 10,
             dim: Int = 64, nBands: Int = 6, bitsPerBand: Int = 4): DataFrame = {
    def bands(v: Column): Column = array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        signBucket(v, dim, bitsPerBand, seed = b * 7919).as("bkt"))): _*)
    val corpus = embeddings
      .select(col("vec_id"), col("embedding"), explode(bands(col("embedding"))).as("bk"))
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"), explode(bands(col("embedding"))).as("bk"))
    corpus
      .join(broadcast(probe), "bk")
      .select(col("vec_id"), col("embedding"), col("probe"))
      .distinct() // a candidate may collide in several bands
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  /** `sim_ann_ivf`: IVF-style approximate top-k — the other standard ANN
    * scale path. A KMeans coarse quantizer (MLlib, distributed fit)
    * partitions the corpus into `nlist` cells; the probe scans only the
    * `nprobe` cells whose centroids are most cosine-aligned. At 100 TB the
    * assignment is precomputed/bucketed by cell so a probe touches
    * nprobe/nlist of the data. Only the probe vector and the tiny centroid
    * set ever reach the driver. No oracle (approximate); ScalaTest asserts
    * recall vs the exact baseline. */
  def annIvf(embeddings: DataFrame, probeId: Long = 0L, k: Int = 10,
             nlist: Int = 8, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.withColumn("fv",
      array_to_vector(col("embedding").cast("array<double>")))
    // few iterations: cells only need to be a stable coarse partition,
    // not a converged clustering
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(feat)
    val assigned = model.transform(feat)
    val probeVec = embeddings.filter(col("vec_id") === probeId)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cells = model.clusterCenters.map(_.toArray).zipWithIndex
      .sortBy { case (c, _) => -cos(c, probeVec) }.take(nprobe).map(_._2)
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    assigned
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  /** `dedup_near_embedding`: embedding-cosine near-duplicate pairs via LSH
    * blocking — candidate pairs share a bucket, then exact cosine filters.
    * Avoids the O(n²) crossJoin: the join is bucket-equi, so at scale it
    * shuffles on bucket and each bucket joins locally. No oracle
    * (approximate recall); ScalaTest checks precision of emitted pairs. */
  def nearDupEmbedding(embeddings: DataFrame, tau: Double = 0.95,
                       dim: Int = 64, nBits: Int = 6): DataFrame = {
    val b = embeddings.withColumn("bucket", signBucket(col("embedding"), dim, nBits))
    val l = b.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val r = b.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .distinct()
      .orderBy("id_a", "id_b")
  }
}
