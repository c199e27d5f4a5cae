package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector / embedding operators over `embeddings` (`embedding:
  * array<float>` dim 64). Dot products use a compiled custom expression
  * (graft.functions.DotProductExpr, codegen'd) — no UDF, no shuffle for
  * the scoring pass. Floats are widened to double *before* multiplying so
  * the arithmetic matches the DuckDB oracle (`embedding::DOUBLE[]`)
  * bit-for-bit.
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

  /** `fn_vector_norm`: L2 normalization summary — the preprocessing pass
    * embedding pipelines run before cosine retrieval. Output is scalar
    * checksums of the unit vector (norm, elementwise-sum over norm, first
    * element over norm) so the oracle compares scalars, not float arrays;
    * the element sum uses the compiled sequential-fold dot against a ones
    * vector, matching DuckDB's accumulation order exactly. */
  def vectorNorm(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val emb = col("embedding")
    val nrm = sqrt(dot(emb, emb))
    val safe = when(nrm === 0, lit(null)).otherwise(nrm)
    val ones = typedlit(Seq.fill(dim)(1.0))
    embeddings
      .select(
        col("vec_id"),
        round(nrm, 6).as("l2norm"),
        round(dot(emb, ones) / safe, 6).as("unit_sum"),
        round(element_at(emb, 1).cast("double") / safe, 6).as("unit_first"))
      .orderBy("vec_id")
  }

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

  /** `sample_hardneg`: hard-negative mining — for each anchor vector,
    * the top-k most-similar vectors carrying a DIFFERENT label (the
    * contrastive-training data-prep pass: easy negatives are random,
    * hard negatives are the near-misses that actually move a retriever/
    * classifier; this is the batch export that builds triplet/InfoNCE
    * training sets from a labeled embedding corpus).
    *
    * Same blocked-matrix shape as [[batchCosineTopK]] — anchors
    * broadcast, one map-only corpus sweep scores every (anchor,
    * candidate) pair, the label inequality filters AT SCAN SPEED before
    * anything shuffles, and the per-anchor ranking window carries only
    * (anchor_id, vec_id, label, score) rows. At 100 TB: anchor blocks ×
    * corpus partitions, negatives-per-anchor bounded by k. */
  def hardNegatives(embeddings: DataFrame, nAnchors: Int = 5,
                    k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val anchors = embeddings.filter(col("vec_id") < nAnchors)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("probe"),
        col("label").as("anchor_label"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("rawcos").desc, col("vec_id"))
    embeddings
      .crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("probe")).as("rawcos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("anchor_id"), col("vec_id"), col("label"),
        round(col("rawcos"), 6).as("cos"), col("rn"))
      .orderBy("anchor_id", "rn")
  }

  /** `sim_batch_topk`: exact top-k neighbors for a SET of probes in one
    * pass — the batched-retrieval shape. The probe set broadcasts (tiny);
    * scoring is one map-only sweep of the corpus computing every
    * (probe, candidate) cosine; per-probe top-k is a row_number window
    * partitioned BY PROBE, so the ranking shuffle carries only
    * (probe_id, vec_id, score) triples, never embeddings. At 100 TB this
    * is a blocked matrix product: corpus partitions × broadcast probe
    * block. */
  def batchCosineTopK(embeddings: DataFrame, nProbes: Int = 5,
                      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("rawcos").desc, col("vec_id"))
    embeddings
      .crossJoin(broadcast(probes))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("rawcos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"),
        round(col("rawcos"), 6).as("cos"), col("rn"))
      .orderBy("probe_id", "rn")
  }

  /** `emb_matryoshka_recall`: retrieval-quality audit of DIMENSION
    * TRUNCATION — for each probe vector, exact cosine top-k over the
    * full `fullDim` dims vs top-k over each Matryoshka prefix in
    * `dims`, reporting per-prefix overlap (recall@k against the
    * full-dim ranking). This is the measurement behind shipping
    * truncated MRL embeddings: it answers "how many dims can the
    * ANN index drop before retrieval degrades", the same audit
    * [[annIvf]]'s IVF_CURVE runs for nprobe.
    *
    * Scale shape: ONE corpus sweep — probes broadcast, every
    * (candidate, probe) row computes ALL prefix scores in THREE
    * single-traversal compiled folds
    * ([[graft.functions.PrefixDotsKernel]]: a·b, a·a, b·b partials at
    * each checkpoint — the slice-per-prefix form allocated up to 24
    * subarrays per row and measured 467 s at sf10; this one is
    * allocation-free per prefix, 12.7 s), then a bounded ×|dims|+1
    * explode into one shuffle of per-(probe, d) top-k — rank windows
    * keyed by (probe_id, d) so Spark's WindowGroupLimit cuts each
    * group to k map-side before the shuffle. The top table is
    * O(probes·dims·k) rows — lazy-pinned, since both the full-dim
    * reference branch and the truncated branches consume it (unpinned,
    * the corpus sweep would re-run per branch). Integer outputs (hit
    * counts, micro-recall) — no float hashing hazard; ranking ties
    * break on vec_id, and a prefix of the sequential fold is
    * bit-identical to the fold of the slice, so both engines rank
    * identical cosines.
    *
    * scan-guard: emb_matryoshka_recall */
  def matryoshkaRecall(embeddings: DataFrame, nProbes: Int = 16,
                       k: Int = 10, dims: Seq[Int] = Seq(8, 16, 32),
                       fullDim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val cps = dims :+ fullDim
    val pd = graft.functions.ShingleExpressions.prefixDots _
    val prefixScores = cps.zipWithIndex.map { case (d, i) =>
      val den = sqrt(element_at(col("aa"), i + 1)) *
        sqrt(element_at(col("bb"), i + 1))
      struct(lit(d).as("d"),
        when(den === 0, lit(null))
          .otherwise(element_at(col("ab"), i + 1) / den).as("rawcos"))
    }
    val scored = embeddings.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        pd(col("embedding"), col("probe"), cps).as("ab"),
        pd(col("embedding"), col("embedding"), cps).as("aa"),
        pd(col("probe"), col("probe"), cps).as("bb"))
      .select(col("probe_id"), col("vec_id"),
        explode(array(prefixScores: _*)).as("s"))
      .select(col("probe_id"), col("vec_id"),
        col("s.d").as("d"), col("s.rawcos").as("rawcos"))
    val w = Window.partitionBy("probe_id", "d")
      .orderBy(col("rawcos").desc, col("vec_id"))
    val top = graft.plans.PlanPins.lazyPin(
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("probe_id", "vec_id", "d"))
    val fullTop = top.filter(col("d") === fullDim)
      .select("probe_id", "vec_id")
    top.filter(col("d") < fullDim)
      .join(fullTop, Seq("probe_id", "vec_id"), "left_semi")
      .groupBy("d").agg(count(lit(1)).as("hits"))
      .select(col("d"), col("hits"),
        expr(s"hits * 1000000 DIV ${k.toLong * nProbes}").as("recall_micro"))
      .orderBy("d")
  }

  /** `sim_range_search`: threshold RANGE similarity query — for each
    * probe, EVERY corpus vector with cosine ≥ τ, not a fixed top-k.
    * The retrieval mode dedup sweeps and "find all near-copies of this
    * document" investigations need ([[cosineTopK]] can silently
    * truncate a dense neighborhood; a range query returns the whole
    * neighborhood or nothing). Inclusion is decided on the INTEGER
    * micro-floored cosine (floor(cos·10⁶) ≥ τ_micro) so the oracle
    * compares integers end to end — no float boundary hazard in either
    * the filter or the output.
    *
    * Scale shape: probes are a broadcast (pushdown-pruned probe scan);
    * scoring is one MAP-ONLY corpus sweep — compiled sequential-fold
    * dot, no shuffle at all before the presentation sort (vs top-k's
    * per-probe heap pass); the τ filter cuts fan-out inside the scan
    * stage. At 100 TB this is the plan you want: |probes|·|corpus|
    * comparisons stream through whole-stage codegen, output is only
    * the matches. For probe sets past broadcast size, the LSH/IVF
    * bucketed variants ([[annLsh]]/[[annIvf]]) are the scale path.
    *
    * scan-guard: sim_range_search */
  def rangeSearch(embeddings: DataFrame, nProbes: Int = 8,
                  tauMicro: Long = 250000L): DataFrame = {
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    embeddings.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        floor(cosine(col("embedding"), col("probe")) * lit(1000000L))
          .cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= tauMicro)
      .orderBy("probe_id", "vec_id")
  }

  /** `emb_mutual_knn`: MUTUAL k-nearest-neighbor graph over a bounded
    * node set — edge (a, b) exists iff b is in a's exact cosine top-k
    * AND a is in b's. Mutual-kNN is the standard candidate graph for
    * semantic-dedup clustering (one-directional kNN links every
    * outlier to SOMETHING; mutuality is the symmetric-density filter
    * that keeps clusters tight). Nodes are the `nNodes` lowest ids —
    * the audit-sample convention ([[matryoshkaRecall]]'s probe set):
    * the full-corpus scale path is [[DedupOps.semanticIvf]]'s
    * co-partitioned cell join, whose candidate pairs this operator's
    * graph is the exact reference for.
    *
    * Scale shape: one pushdown-pruned node scan each side of a
    * broadcast product (nNodes² bounded rows), per-node top-k through
    * the WindowGroupLimit map-side cut; the directed top-k table
    * (O(nodes·k)) is lazy-pinned — the mutuality self-join consumes it
    * twice. Cosine is symmetric at the bit level (elementwise multiply
    * commutes, fold order unchanged), so the (a, b)/(b, a) scores the
    * join equates are identical doubles, and the output micro-floor
    * never straddles a pair. Integer outputs, ties on neighbor id.
    *
    * scan-guard: emb_mutual_knn */
  def mutualKnn(embeddings: DataFrame, nNodes: Int = 256,
                k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nodes = embeddings.filter(col("vec_id") < nNodes)
      .select(col("vec_id"), col("embedding"))
    val others = nodes.select(col("vec_id").as("nbr_id"),
      col("embedding").as("nbr"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("rawcos").desc, col("nbr_id"))
    val directed = graft.plans.PlanPins.lazyPin(
      nodes.crossJoin(broadcast(others))
        .filter(col("vec_id") =!= col("nbr_id"))
        .select(col("vec_id"), col("nbr_id"),
          cosine(col("embedding"), col("nbr")).as("rawcos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("vec_id"), col("nbr_id"), col("rawcos")))
    val reversed = directed.select(col("nbr_id").as("vec_id"),
      col("vec_id").as("nbr_id"))
    directed.filter(col("vec_id") < col("nbr_id"))
      .join(reversed, Seq("vec_id", "nbr_id"), "left_semi")
      .select(col("vec_id").as("id_a"), col("nbr_id").as("id_b"),
        floor(col("rawcos") * lit(1000000L)).cast("long").as("cos_micro"))
      .orderBy("id_a", "id_b")
  }

  /** Sign-bit packing of one 32-dim half of an embedding into a long:
    * bit i set iff dim (off+i) > 0 — a pure comparison, no float
    * arithmetic, so both engines pack identical words. */
  private def signWord(e: String, off: Int): Column =
    expr(s"""aggregate(sequence(0, 31), 0L, (acc, i) ->
             acc + CASE WHEN element_at($e, i + ${off + 1}) > 0.0
                        THEN shiftleft(1L, i) ELSE 0L END)""")

  /** `sim_hamming_topk`: BINARY-SKETCH nearest neighbors — embeddings
    * collapse to their 64 sign bits (two 32-bit words), similarity is
    * popcount Hamming distance, and each probe takes its exact top-k
    * under (distance asc, vec_id). This is the 1-bit quantization tier
    * of the ANN ladder ([[cosineTopK]] exact float → [[annLsh]] bucket
    * recall → this): 32× smaller than the float vectors, distance =
    * two XOR+POPCNT ops, and sign-sketch Hamming approximates angular
    * distance (the SimHash argument, [[graft.functions.
    * ShingleExpressions.simHash64]]'s vector-side sibling). Integer
    * end to end — the only float op is the SIGN COMPARISON, identical
    * in both engines, so the whole pipeline is exactly oracle-able
    * (unlike real quantized-distance reranking).
    *
    * Scale shape: packing is a map-only pass (bounded 32-element fold
    * per word, the residual-HOF class — bounded per row, not corpus
    * fan-out); at 100 TB the packed table is the thing you SINK and
    * re-scan (16 bytes/vector). Probes broadcast; ranking is a
    * per-probe WindowGroupLimit top-k, map-side cut before the one
    * shuffle. Ties break on vec_id.
    *
    * scan-guard: sim_hamming_topk */
  def hammingTopK(embeddings: DataFrame, nProbes: Int = 8,
                  k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = embeddings.select(col("vec_id"),
      signWord("embedding", 0).as("w0"),
      signWord("embedding", 32).as("w1"))
    val probes = packed.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("w0").as("p0"),
        col("w1").as("p1"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("hamming"), col("vec_id"))
    packed.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        expr("CAST(bit_count(w0 ^ p0) + bit_count(w1 ^ p1) AS BIGINT)")
          .as("hamming"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"), col("hamming"),
        col("rn").cast("int").as("rn"))
      .orderBy("probe_id", "rn")
  }

  /** Deterministic pseudo-random hyperplane coefficients in [-1, 1),
    * derived from a hash of (plane index, dimension index) — no RNG
    * state, so executors regenerate identical planes with no driver
    * broadcast. floorMod, not %: h can be negative and a signed
    * remainder would skew coefficients into (-3, 1) — negatively biased
    * hyperplanes degrade bucket uniformity and recall.
    *
    * PUBLIC single source of truth: [[signBucket]] builds its Column
    * expressions from this, and [[graft.OracleGen]] inlines the same
    * values into generated DuckDB SQL — which is what makes the sign-LSH
    * queries exactly oracle-checkable despite being "approximate". */
  def planeCoefficients(p: Int, seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      val h = (((p + seed) * 1315423911L) ^ (d * 2654435761L)) * 40503L
      (math.floorMod(h, 2000003L).toDouble / 1000001.5) - 1.0 // [-1,1)
    }

  /** Random-hyperplane (sign) LSH bucketing: `nBits` fixed pseudo-random
    * hyperplanes → one integer bucket per vector. Each plane is ONE array
    * literal (typedlit) folded with the compiled dot product so codegen
    * stays compact — an unrolled 64-term sum per plane overflows the
    * JVM's 64KB method limit. */
  private def signBucket(v: Column, dim: Int, nBits: Int, seed: Int = 0): Column = {
    def plane(p: Int): Column = dot(v, typedlit(planeCoefficients(p, seed, dim)))
    (0 until nBits)
      .map(p => when(plane(p) >= 0, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Banded sign-LSH bucket keys of a vector: `nBands` independent
    * (band, bucket) structs (OR-amplification — a candidate matches in
    * ANY band). */
  private def lshBands(v: Column, dim: Int, nBands: Int,
                       bitsPerBand: Int): Column =
    array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        signBucket(v, dim, bitsPerBand, seed = b * 7919).as("bkt"))): _*)

  /** `sim_ann_lsh`: approximate top-k via banded sign-LSH — the scale
    * path. Only same-bucket candidates are scored, turning the full scan
    * into a bucket-equi join; recall vs candidate-set size is tuned by
    * (nBands, bitsPerBand).
    *
    * Shuffle hygiene: band rows and the candidate dedup carry ONLY
    * (vec_id, band-key) — 16 bytes — never the 64-float embedding;
    * embeddings are re-attached to the (small) deduped candidate set
    * afterwards. Oracled exactly despite being "approximate": the planes
    * are deterministic, so [[graft.OracleGen.simAnnLshSql]] reproduces
    * the identical candidate set + scores in DuckDB; ScalaTest
    * additionally asserts recall against the exact baseline. */
  def annLsh(embeddings: DataFrame, probeId: Long = 0L, k: Int = 10,
             dim: Int = 64, nBands: Int = 6, bitsPerBand: Int = 4): DataFrame = {
    def bands(v: Column): Column = lshBands(v, dim, nBands, bitsPerBand)
    val corpusBands = embeddings
      .select(col("vec_id"), explode(bands(col("embedding"))).as("bk"))
    val probeBands = embeddings.filter(col("vec_id") === probeId)
      .select(explode(bands(col("embedding"))).as("bk"))
    // a candidate may collide in several bands → dedup on the 8-byte id,
    // not on (id, embedding, probe) rows
    val candIds = corpusBands
      .join(broadcast(probeBands), Seq("bk"), "left_semi")
      .select("vec_id").distinct()
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    embeddings
      .join(candIds, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  /** `sim_ann_lsh_batch`: approximate top-k for a probe SET via the same
    * banded sign-LSH — the sub-linear batched-retrieval path (the exact
    * sweep `batchCosineTopK` scores corpus × probes; this scores only
    * bucket-colliding candidate pairs). Candidate generation is a
    * bucket-equi join of two (id, band-key) tables — when the probe set
    * is itself large, this is a plain shuffle join on the band key, no
    * broadcast required; embeddings re-attach to the deduped (probe_id,
    * vec_id) candidates afterwards. Oracled exactly via the generated
    * coefficient SQL ([[graft.OracleGen.simAnnLshBatchSql]]); ScalaTest
    * additionally asserts per-probe recall vs the exact batch sweep. */
  def annLshBatch(embeddings: DataFrame, nProbes: Int = 5, k: Int = 10,
                  dim: Int = 64, nBands: Int = 8, bitsPerBand: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bands(v: Column): Column = lshBands(v, dim, nBands, bitsPerBand)
    val corpusBands = embeddings
      .select(col("vec_id"), explode(bands(col("embedding"))).as("bk"))
    val probeBands = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), explode(bands(col("embedding"))).as("bk"))
    val cand = corpusBands.join(probeBands, Seq("bk"))
      .select("probe_id", "vec_id").distinct()
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("rawcos").desc, col("vec_id"))
    cand
      .join(embeddings, "vec_id")
      .join(probes, "probe_id")
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("rawcos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"),
        round(col("rawcos"), 6).as("cos"), col("rn"))
      .orderBy("probe_id", "rn")
  }

  /** A built IVF index: the tiny centroid table (nlist rows) plus the
    * corpus with its cell assignment, repartitioned BY CELL and cached —
    * the in-memory analog of writing the assignment out bucketed by cell.
    * Build once, probe many times: a probe touches only its `nprobe`
    * cells and never re-fits the quantizer. `centers` carries the fitted
    * centroid coordinates driver-side (nlist × dim doubles) — the oracle
    * seam: [[graft.SparkEntry.dynamicOracleSql]] inlines them as SQL
    * literals so DuckDB replays assignment + probe bit-identically
    * (the sim_ann_lsh hyperplane device, applied to a FITTED model). */
  final case class IvfIndex(centroids: DataFrame, assigned: DataFrame,
                            centers: IndexedSeq[Seq[Double]])

  /** Deterministic cell assignment: argmax centroid cosine over the
    * exported centroid literals, ties to the smallest cell id — a
    * compiled sequential-fold plan, NOT `model.transform` (r15): MLlib's
    * transform assigns through BLAS-order Euclidean distances that no
    * other engine reproduces bit-for-bit, which is what kept the whole
    * IVF family oracle-less through r14. Spherical (cosine) assignment
    * also matches the probe metric — the index buckets by the same
    * similarity the query ranks with. Zero-norm vectors pin to -1 via
    * COALESCE on both engines. */
  private[operators] def cellAssign(e: Column,
                                    centers: IndexedSeq[Seq[Double]]): Column = {
    val entries = centers.zipWithIndex.map { case (c, i) =>
      struct((-coalesce(cosine(e, typedlit(c)), lit(-1.0))).as("negcos"),
        lit(i).as("cell"))
    }
    least(entries: _*).getField("cell")
  }

  /** Index build (offline path): one distributed KMeans fit (the coarse
    * quantizer — few iterations, cells only need to be a stable partition,
    * not a converged clustering; the FIT stays unoracled) + one
    * deterministic [[cellAssign]] assignment pass over the exported
    * centers. At 100 TB the assignment table is written to storage
    * partitioned by `cell`; here it is cached with the same layout. */
  def buildIvfIndex(embeddings: DataFrame, nlist: Int = 8): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feat = embeddings.withColumn("fv",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(feat)
    val centers: IndexedSeq[Seq[Double]] =
      model.clusterCenters.toIndexedSeq.map(_.toArray.toSeq)
    val assigned = embeddings
      .select(col("vec_id"), col("embedding"),
        cellAssign(col("embedding"), centers).as("cell"))
      .repartition(col("cell"))
      .cache()
    assigned.count() // materialize: probes must not pay the build
    val centroids = embeddings.sparkSession.createDataFrame(
      centers.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("cell", "centroid")
    IvfIndex(centroids, assigned, centers)
  }

  /** Probe (query path): rank the nlist centroids against the probe (a
    * tiny broadcast cross join — no driver `.head()`, no collect), semi-
    * join the assignment table down to the top `nprobe` cells, score only
    * those. Work per probe = nprobe/nlist of the corpus. */
  def ivfProbe(index: IvfIndex, probe: DataFrame, k: Int = 10,
               nprobe: Int = 4): DataFrame = {
    val topCells = index.centroids
      .crossJoin(broadcast(probe))
      .select(col("cell"), cosine(col("centroid"), col("probe")).as("ccos"))
      .orderBy(col("ccos").desc, col("cell"))
      .limit(nprobe)
      .select("cell")
    index.assigned
      .join(broadcast(topCells), Seq("cell"), "left_semi")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  // Index registry keyed by (session, corpus plan, nlist): the driver-side
  // analog of a persisted index — repeated probes against the same corpus
  // reuse the fitted quantizer + cached cell-bucketed assignment instead of
  // re-fitting KMeans inside every query (round-1's single most expensive
  // bench entry). Bounded LRU (advisor finding: an unbounded registry keyed
  // by identityHashCode grows driver+executor memory across sessions and
  // corpora): at capacity the least-recently-probed index is evicted and
  // its cached assignment unpersisted. Staleness: the key combines the
  // PLAN's semantic hash with a modification snapshot of the plan's input
  // files ([[inputSnapshot]]), so a corpus rewritten in place under the
  // same path misses the cache and rebuilds instead of silently serving
  // the old index (SkewAndIvfSpec overwrites a corpus and asserts the
  // rebuild).
  private val maxIvfIndexes = 8
  private val ivfIndexes =
    new java.util.LinkedHashMap[String, IvfIndex](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, IvfIndex]): Boolean = {
        val evict = size() > maxIvfIndexes
        if (evict) {
          try e.getValue.assigned.unpersist(blocking = false)
          catch { case _: Throwable => } // session may already be stopped
        }
        evict
      }
    }

  /** Drop every cached IVF index and unpersist their assignment tables.
    * Call after overwriting corpus files in place (see staleness caveat
    * on the registry) or when tearing down a session. */
  def clearIvfIndexes(): Unit = ivfIndexes.synchronized {
    ivfIndexes.values.forEach { idx =>
      try idx.assigned.unpersist(blocking = false)
      catch { case _: Throwable => }
    }
    ivfIndexes.clear()
  }

  /** Modification snapshot of a plan's input files, folded into the IVF
    * cache key so an in-place rewrite of the corpus (same path, new data)
    * cannot serve a stale index. One `listStatus` per distinct parent
    * directory — O(directories) namenode RPCs, not O(files) — which at
    * real table layouts (few partition dirs, many files each) is cheap;
    * a table format with its own snapshot id would key on that instead.
    * Plans with no file inputs (in-memory relations, which are immutable)
    * snapshot to a constant. */
  private[graft] def inputSnapshot(df: DataFrame): Long = {
    import org.apache.hadoop.fs.Path
    val files = df.inputFiles
    if (files.isEmpty) return 0L
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val wanted = files.toSet
    files.map(new Path(_)).groupBy(_.getParent).toSeq
      .flatMap { case (parent, _) =>
        val fs = parent.getFileSystem(hconf)
        try fs.listStatus(parent).toSeq
          .filter(s => wanted.contains(s.getPath.toString))
        catch { case _: java.io.IOException => Seq.empty }
      }
      .map(s => (s.getPath.toString, s.getModificationTime, s.getLen))
      .sortBy(_._1)
      .foldLeft(17L) { case (acc, (p, m, l)) =>
        ((acc * 31 + p.hashCode) * 31 + m) * 31 + l }
  }

  // key includes the session identity (a cached index must not outlive
  // the SparkSession whose cache blocks it lives in), the plan's semantic
  // hash, and the input-file modification snapshot (staleness guard)
  private def ivfKey(embeddings: DataFrame, nlist: Int): String =
    s"${System.identityHashCode(embeddings.sparkSession)}:" +
      s"${embeddings.queryExecution.analyzed.semanticHash()}:" +
      s"${inputSnapshot(embeddings)}:$nlist"

  /** `sim_ann_ivf`: IVF-style approximate top-k = cached [[buildIvfIndex]]
    * + [[ivfProbe]]. No oracle (approximate); ScalaTest asserts recall vs
    * the exact baseline. */
  def annIvf(embeddings: DataFrame, probeId: Long = 0L, k: Int = 10,
             nlist: Int = 8, nprobe: Int = 4): DataFrame = {
    val index = cachedIvfIndex(embeddings, nlist)
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    ivfProbe(index, probe, k, nprobe)
  }

  /** Registry-cached [[buildIvfIndex]] — the shared offline-index seam:
    * `annIvf`/`annIvfBatch` probes and [[graft.operators.DedupOps
    * .semanticIvf]] (SemDeDup rides the SAME cell assignment) all reuse
    * one fitted quantizer + cached cell-bucketed table per (session,
    * corpus plan, input snapshot, nlist). */
  def cachedIvfIndex(embeddings: DataFrame, nlist: Int = 8): IvfIndex = {
    val key = ivfKey(embeddings, nlist)
    ivfIndexes.synchronized {
      Option(ivfIndexes.get(key)).getOrElse {
        val built = buildIvfIndex(embeddings, nlist)
        ivfIndexes.put(key, built)
        built
      }
    }
  }

  /** Batch probe (query path, N probes at once): rank every centroid per
    * probe in one tiny cross join (nlist × |probes| rows), keep the top
    * `nprobe` cells per probe, then hit the cell-bucketed assignment
    * table with the (probe_id, cell) pairs in a single pass — one scan
    * of the touched cells serves ALL probes, instead of |probes|
    * corpus-semi-joins. The pair table and the probe vectors broadcast
    * (both bounded by |probes|); a probe set too large to broadcast
    * becomes an equi-join on the same keys, same plan otherwise.
    *
    * scan-guard: exempt (probes the session-cached IvfIndex — an
    * InMemoryRelation; there is no file scan in the plan to count) */
  def ivfProbeBatch(index: IvfIndex, probes: DataFrame, k: Int = 10,
                    nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCell = Window.partitionBy("probe_id").orderBy(col("ccos").desc, col("cell"))
    val probeCells = index.centroids
      .crossJoin(probes)
      .select(col("probe_id"), col("cell"),
        cosine(col("centroid"), col("probe")).as("ccos"))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= nprobe)
      .select("probe_id", "cell")
    val wK = Window.partitionBy("probe_id").orderBy(col("rawcos").desc, col("vec_id"))
    index.assigned
      .join(broadcast(probeCells), Seq("cell"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("rawcos"))
      .withColumn("rn", row_number().over(wK))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("vec_id"),
        round(col("rawcos"), 6).as("cos"), col("rn"))
      .orderBy("probe_id", "rn")
  }

  /** `sim_ann_ivf_batch`: the IVF analog of [[annLshBatch]] — cached
    * index, one batched probe pass. DYNAMICALLY oracled since r15
    * ([[graft.OracleGen.simAnnIvfBatchSql]] via
    * [[graft.SparkEntry.dynamicOracleSql]]): the fitted centroids
    * inline as SQL literals and DuckDB replays cell assignment, probe
    * ranking and scoring — so the defaults here (nProbes, k, nlist,
    * nprobe) MUST stay in lockstep with what simAnnIvfBatchSql
    * generates; change them together or the gate hash-splits. ScalaTest
    * additionally asserts per-probe recall vs the exact batch
    * baseline. */
  def annIvfBatch(embeddings: DataFrame, nProbes: Int = 5, k: Int = 10,
                  nlist: Int = 8, nprobe: Int = 4): DataFrame = {
    val index = cachedIvfIndex(embeddings, nlist)
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    ivfProbeBatch(index, probes, k, nprobe)
  }

  /** A fitted product-quantization codebook: `centers(j)(c)` is the
    * c-th centroid of subspace j (dim/m coordinates each). The PQ tier
    * of the ANN ladder (r15): exact cosine → sign-LSH → IVF → binary
    * Hamming → THIS — 4 bits per subspace × 8 subspaces packs a
    * 64-float vector into ONE BIGINT, the 8-byte sink-and-rescan
    * artifact that makes billion-vector rerank feasible (Jégou et al.
    * 2011). Fit = m independent KMeans (one per subspace — the
    * unoracled part, like the IVF quantizer); everything downstream
    * (assignment, packing, reconstruction error, ADC scoring) is
    * compiled sequential-fold arithmetic over the EXPORTED centers, so
    * [[graft.SparkEntry.dynamicOracleSql]] replays it bit-identically
    * in DuckDB. */
  final case class PqCodebook(m: Int, k: Int, dsub: Int,
                              centers: IndexedSeq[IndexedSeq[Seq[Double]]])

  /** Codebook fit = ONE bounded deterministic sample collect + pure
    * driver Lloyd per subspace (the Skew-boundary/KMeans collect
    * pattern — O(sample) to the driver, never the corpus). The r15
    * first cut ran 8 MLlib KMeans fits and was FIT-OVERHEAD-bound at
    * sf10 (~1.5 s of job machinery per fit regardless of data size);
    * a 16-centroid coarse quantizer needs ~10⁴ training points, so the
    * fit collects `targetSample` modulo-selected vectors (mod derived
    * from the corpus count — bounded driver memory at ANY scale,
    * reproducible across runs/engines) and iterates Lloyd in-process
    * (seeded at the first k distinct subvectors by vec_id order, ties
    * impossible — 5 sweeps over ≤ 2·10⁴×8 doubles is microseconds).
    * The fit stays unoracled (only the exported centers matter); the
    * ENCODE pass always covers every vector. */
  def buildPqCodebook(embeddings: DataFrame, m: Int = 8, k: Int = 16,
                      dim: Int = 64, targetSample: Long = 20000L,
                      iters: Int = 5): PqCodebook = {
    // the packed layout is 4-bit lanes (packedCodeCols): k > 16 codes
    // would silently bleed into the neighbour lane — resolution past 16
    // centroids/subspace is bought with MORE subspaces (m), not wider
    // lanes (the spanRewrite pack-domain lesson, made a construction-
    // time check here because m and k are programmer inputs, not data)
    require(k >= 2 && k <= 16, s"PQ k must be in [2, 16], got $k")
    require(m >= 1 && dim % m == 0, s"PQ m must divide dim=$dim, got $m")
    val dsub = dim / m
    val n = embeddings.count()
    val mod = math.max(1L, n / targetSample)
    val sample = embeddings
      .filter(col("vec_id") % mod === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "PQ codebook fit needs a nonempty corpus")
    val centers = (0 until m).map { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // init: first k DISTINCT subvectors in vec_id order
      val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
      var pi = 0
      while (init.length < k && pi < pts.length) {
        if (seen.add(pts(pi).toSeq)) init += pts(pi).clone()
        pi += 1
      }
      var cs = init.toArray
      (1 to iters).foreach { _ =>
        val sums = Array.fill(cs.length)(new Array[Double](dsub))
        val cnts = new Array[Long](cs.length)
        pts.foreach { p =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < cs.length) {
            var d = 0.0
            var i = 0
            while (i < dsub) { val t = p(i) - cs(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          cnts(best) += 1
        }
        cs = cs.indices.map { c =>
          if (cnts(c) == 0) cs(c)
          else Array.tabulate(dsub)(i => sums(c)(i) / cnts(c))
        }.toArray
      }
      // degenerate corpora may yield < k distinct points — pad by
      // repeating the last center so the packed-code width is stable
      val padded = if (cs.length >= k) cs
        else cs ++ Array.fill(k - cs.length)(cs.last.clone())
      padded.toIndexedSeq.map(_.toSeq)
    }
    PqCodebook(m, k, dsub, centers)
  }

  // PQ codebook registry — the cachedIvfIndex recipe (session + plan +
  // input snapshot keyed); codebooks are tiny (m·k·dsub doubles), no
  // eviction pressure, entries die with the JVM
  private val pqBooks =
    new java.util.concurrent.ConcurrentHashMap[String, PqCodebook]()

  def cachedPqCodebook(embeddings: DataFrame, m: Int = 8,
                       k: Int = 16): PqCodebook =
    pqBooks.computeIfAbsent(
      s"${System.identityHashCode(embeddings.sparkSession)}:" +
        s"${embeddings.queryExecution.analyzed.semanticHash()}:" +
        s"${inputSnapshot(embeddings)}:$m:$k",
      _ => buildPqCodebook(embeddings, m, k))

  /** Per-subspace argmin struct `(d, code)` with d = |c|² − 2·x_j·c —
    * the sqdist argmin with the |x_j|² term dropped (constant per row
    * within a subspace, so the argmin is unchanged and the expression
    * stays one fold per centroid); ties to the smallest code via the
    * struct order (the cellAssign device). */
  private def pqSub(e: Column, j: Int, cb: PqCodebook): Column = {
    val sub = slice(e, j * cb.dsub + 1, cb.dsub)
    least(cb.centers(j).zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      struct((lit(cc) - lit(2.0) * dot(sub, typedlit(c))).as("d"),
        lit(i.toLong).as("code"))
    }: _*)
  }

  /** `emb_pq_encode`: PQ-encode the corpus — one packed BIGINT of
    * 8 × 4-bit codes per vector plus the exact reconstruction error in
    * micro (‖x − recon‖² = ‖x‖² + Σ_j min_d_j, since min_d_j already
    * carries |c|² − 2x_j·c). Map-only over one corpus scan; the
    * fitted centers ride the plan as literals (cluster-safe — no
    * driver-state closure). scan-guard: emb_pq_encode */
  def pqEncode(embeddings: DataFrame, m: Int = 8, k: Int = 16): DataFrame =
    // terminal display order re-applied AFTER the cache read (r16;
    // ADVICE r15 + VERDICT r15 #4): the cached files carry no order
    // guarantee, and dropping the pre-write corpus-wide sort cuts the
    // cold build — order-insensitive consumers (pqTopK's ADC scoring)
    // read [[pqCodes]] directly and never pay this sort.
    pqCodes(embeddings, m, k).orderBy("vec_id")

  /** The UNSORTED PQ codes projection — one row per vector: packed
    * codes + reconstruction error. r15: a SHARED projection
    * (sim_pq_topk/sim_pq_rerank score over it; at deployment it is THE
    * sunk artifact) — session file-cached like the graph/dedup
    * projections, conf `spark.graft.pq.codesCache` (default ON; the
    * plan-shape spec clones a conf-off session). */
  private[graft] def pqCodes(embeddings: DataFrame, m: Int = 8,
                             k: Int = 16): DataFrame = {
    val cb = cachedPqCodebook(embeddings, m, k)
    val withSubs = embeddings.select(
      col("vec_id") +: col("embedding").as("e") +:
        (0 until m).map(j => pqSub(col("embedding"), j, cb).as(s"s$j")): _*)
    val errRaw = (0 until m).map(j => col(s"s$j.d")).reduce(_ + _) +
      dot(col("e"), col("e"))
    graft.plans.ProjectionCache("pq", "spark.graft.pq.codesCache",
      withSubs.select(col("vec_id") +: packedCodeCols(m) :+
        (errRaw * 1e6).cast("long").as("recon_err_micro"): _*))
  }

  /** Packed-code WORD layout (r19, VERDICT r18 Next #6): 4-bit lanes,
    * 16 lanes per 64-bit word, `ceil(m/16)` words — word 0 keeps the
    * historic `pq_code` name (bit-identical to the single-long form
    * for every m ≤ 16, so the registry slugs and their m=8 oracles are
    * untouched); words 1+ are `pq_code1`, `pq_code2`… The multi-word
    * form exists because the sf10 recall ceiling is CODE RESOLUTION:
    * the corpus's 10th→200th-NN cosine margin is 0.059 while the
    * m=16 (64-bit) ADC error std measures 0.081 — no probe width or
    * rerank depth can rank below the noise floor; m=32 (128-bit)
    * measures 0.046 and clears it (docs/IVFPQ_RECALL_R19.md). */
  private def pqCodeNames(m: Int): Seq[String] =
    (0 until (m + 15) / 16).map(w => if (w == 0) "pq_code" else s"pq_code$w")

  /** shift+OR over disjoint 4-bit lanes — value-identical to the
    * multiply+add the oracle SQL replays for m=8, but ANSI-overflow-
    * safe at m=16 where lane 15 occupies bits 60-63 (r18: the curve
    * harness sweeps m; multiply threw ARITHMETIC_OVERFLOW there). */
  private def packedCodeCols(m: Int): Seq[Column] =
    pqCodeNames(m).zipWithIndex.map { case (name, w) =>
      ((w * 16) until math.min(m, (w + 1) * 16))
        .map(j => shiftleft(col(s"s$j.code"), 4 * (j % 16)))
        .reduce(_.bitwiseOR(_)).as(name)
    }

  /** `sim_pq_topk`: asymmetric-distance (ADC) top-k over the packed PQ
    * codes — the query path PQ exists for: the probe builds an m×k
    * lookup table of per-subspace distances ONCE (driver-side, from the
    * 1-row probe collect — the KMeans/BPE driver pattern), and scoring
    * a candidate is m table lookups on its packed code, never a float
    * fold over the vector. At 100 TB the scored table is the 8-byte
    * code column; the full vectors are only touched by a final rerank
    * tier (composable with [[cosineTopK]] on the survivors).
    * scan-guard: exempt (the probe collect + codebook fit run at
    * construction; the returned plan executes one corpus scan through
    * the pqEncode projection — guarded by emb_pq_encode's entry) */
  /** The probe's m×k ADC lookup table: LUT_j(c) = ‖p_j − c‖² by exact
    * sequential per-coordinate folds — shared by [[pqTopK]] (as plan
    * literals) and the dynamic oracle (as SQL literals), so both carry
    * the identical doubles. */
  private[graft] def pqProbeLut(embeddings: DataFrame, probeId: Long = 0L,
      m: Int = 8, k: Int = 16): IndexedSeq[Seq[Double]] = {
    val cb = cachedPqCodebook(embeddings, m, k)
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0)
    lutFor(probe, cb)
  }

  /** The exact per-coordinate LUT fold for one probe vector — shared by
    * the single-probe and batch LUT builders so both carry identical
    * doubles. */
  private def lutFor(probe: Seq[Double],
                     cb: PqCodebook): IndexedSeq[Seq[Double]] =
    (0 until cb.m).map { j =>
      cb.centers(j).map { c =>
        var d = 0.0
        var i = 0
        while (i < cb.dsub) {
          val diff = probe(j * cb.dsub + i) - c(i)
          d += diff * diff
          i += 1
        }
        d
      }
    }

  /** Per-probe ADC LUTs for the batch probes (vec_id 0..nProbes-1, in
    * vec_id order) — one bounded collect; shared by [[annIvfPqBatch]]
    * (as a 3-level plan literal) and the dynamic oracle (as per-probe
    * SQL literal chains). */
  private[graft] def pqProbeLutBatch(embeddings: DataFrame,
      nProbes: Int = 5, m: Int = 8,
      k: Int = 16): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val cb = cachedPqCodebook(embeddings, m, k)
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy("vec_id").collect()
    require(probes.length == nProbes &&
      probes.zipWithIndex.forall { case (r, i) => r.getLong(0) == i.toLong },
      s"batch probes must be exactly vec_id 0..${nProbes - 1}")
    probes.toIndexedSeq.map(r => lutFor(r.getSeq[Double](1), cb))
  }

  /** The ADC score expression over a packed `pq_code` column: m LUT
    * lookups, one per 4-bit slice — shared by [[pqTopK]] (corpus-wide
    * tier 1) and [[annIvfPq]] (cell-routed tier 1). */
  private def adcExpr(lut: IndexedSeq[Seq[Double]], m: Int): Column =
    (0 until m).map { j =>
      element_at(typedlit(lut(j)),
        (shiftright(col(pqCodeNames(m)(j / 16)), 4 * (j % 16))
          .bitwiseAND(lit(15L)) + 1).cast("int"))
    }.reduce(_ + _)

  def pqTopK(embeddings: DataFrame, probeId: Long = 0L, kNn: Int = 10,
             m: Int = 8, k: Int = 16): DataFrame = {
    val lut = pqProbeLut(embeddings, probeId, m, k)
    val codes = pqCodes(embeddings, m, k)
      .select(col("vec_id") +: pqCodeNames(m).map(col): _*)
    codes.select(col("vec_id"),
        (adcExpr(lut, m) * 1e6).cast("long").as("adc_micro"))
      .orderBy(col("adc_micro").asc, col("vec_id"))
      .limit(kNn)
  }

  /** `sim_pq_rerank`: the production two-tier retrieval plan (r16,
    * VERDICT r15 #6b) — PQ ADC over the 8-byte codes selects `topR`
    * survivors, then EXACT cosine reranks the survivors to the final
    * top-k. This is the composition PQ exists for at 100 TB: tier 1
    * touches only the codes projection (the sunk artifact — m table
    * lookups per candidate, never a float fold); tier 2 touches full
    * vectors for just `topR` rows (a broadcast semi-join id filter at
    * scan speed, then a 1-row probe crossJoin — the cosineTopK shape
    * bounded to topR instead of the corpus). Recall is audited by
    * `retrieval_pq_recall` ([[graft.operators.RetrievalOps.pqRecall]]),
    * the recall_at_k device.
    *
    * Dynamically oracled ([[graft.OracleGen.pqRerankSql]]): the
    * survivor set replays through the codebook+LUT literals, the rerank
    * through the same guarded-cosine SQL as sim_cosine_topk — defaults
    * here (kNn, topR, m, k) must stay in lockstep with the generator.
    * scan-guard: sim_pq_rerank */
  def pqRerank(embeddings: DataFrame, probeId: Long = 0L, kNn: Int = 10,
               topR: Int = 50, m: Int = 8, k: Int = 16): DataFrame = {
    val survivors = pqTopK(embeddings, probeId, topR, m, k).select("vec_id")
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    embeddings.join(broadcast(survivors), Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(kNn)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  /** The combined IVF+PQ codes projection — one row per vector:
    * (vec_id, cell, pq_code). This is FAISS's IVFPQ index re-expressed
    * as a columnar table: the inverted lists ARE the artifact's
    * `partitionBy(cell)` directory layout (r18 — a routed probe opens
    * only its cells' files), and each posting carries the vector's
    * packed 8-byte PQ code. Built in ONE corpus scan (cell
    * assignment and the m subspace argmins are all compiled expressions
    * over the same embedding read — the fitted centers ride the plan as
    * literals, cluster-safe); session file-cached under
    * `spark.graft.pq.ivfCodesCache` like the flat codes projection — at
    * 100 TB it is THE sunk retrieval artifact and every probe touches
    * only its routed cells' slices of it.
    * scan-guard: sim_ann_ivfpq */
  private[graft] def ivfPqCodes(embeddings: DataFrame, nlist: Int = 8,
                                m: Int = 8, k: Int = 16): DataFrame = {
    val centers = cachedIvfIndex(embeddings, nlist).centers
    val cb = cachedPqCodebook(embeddings, m, k)
    val withSubs = embeddings.select(
      col("vec_id") +:
        cellAssign(col("embedding"), centers).as("cell") +:
        (0 until m).map(j => pqSub(col("embedding"), j, cb).as(s"s$j")): _*)
    // partitionBy(cell) (r18, VERDICT r17 #2): the artifact's layout IS
    // the inverted-list structure — a probe's routed-cell filter becomes
    // a PartitionFilters directory selection (nprobe/nlist of the
    // artifact's files opened), proven by PlanGuardSpec's
    // ivfpq_partition_prune device. Packing is word-generalized
    // (packedCodeCols): one BIGINT for m ≤ 16, ceil(m/16) words past it
    graft.plans.ProjectionCache("pq", "spark.graft.pq.ivfCodesCache",
      withSubs.select(col("vec_id") +: col("cell") +: packedCodeCols(m): _*),
      partitionBy = Seq("cell"))
  }

  /** `sim_ann_ivfpq`: the ANN ladder's top tier (VERDICT r16 #2) — the
    * FAISS-IVFPQ production plan composed from the shipped rungs: coarse
    * IVF routing (the probe ranks the nlist centroid literals and keeps
    * `nprobe` cells — [[ivfProbe]]'s device), per-cell ADC over the
    * packed codes (the probe's m×k LUT is driver-computed from the
    * 1-row collect and rides the plan as literals — [[pqTopK]]'s
    * device), and exact cosine rerank of the `topR` ADC survivors
    * ([[pqRerank]]'s tier 2). At 100 TB: tier 0 is driver arithmetic
    * over nlist rows; tier 1 OPENS only nprobe/nlist of the 8-byte
    * codes artifact — the artifact is written `partitionBy(cell)` and
    * the routed cells enter the plan as a literal IN, so pruning is
    * static `PartitionFilters` directory selection (guarded by
    * PlanGuardSpec's ivfpq_partition_prune device), never a corpus scan
    * with a post-open row filter; tier 2 touches full vectors for topR
    * ids via a broadcast semi-join at scan speed. Dynamically oracled ([[graft.OracleGen.ivfPqSql]]):
    * cells + codebooks + LUT inline as literals and DuckDB replays
    * routing, ADC, and rerank; recall vs exact audited by
    * `retrieval_ivfpq_recall`. Defaults must stay in lockstep with the
    * generator. */
  def annIvfPq(embeddings: DataFrame, probeId: Long = 0L, kNn: Int = 10,
               topR: Int = 50, nlist: Int = 8, nprobe: Int = 4,
               m: Int = 8, k: Int = 16): DataFrame = {
    val index = cachedIvfIndex(embeddings, nlist)
    val lut = pqProbeLut(embeddings, probeId, m, k)
    val codes = ivfPqCodes(embeddings, nlist, m, k)
    val probe = embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").as("probe"))
    // tier 0: coarse routing — nlist centroid rows vs the 1-row probe,
    // the same ranking ivfProbe uses, COLLECTED (r18, VERDICT r17 #2):
    // routing is driver arithmetic over nlist rows (the LUT already
    // rides a 1-row collect), and a LITERAL cell set is what turns
    // tier 1's read of the cell-partitioned codes artifact into static
    // PartitionFilters directory pruning — a broadcast semi-join prunes
    // rows after opening every cell's files; the literal IN prunes the
    // directories themselves. At 100 TB tier 1 then opens nprobe/nlist
    // of the artifact, byte-for-byte the inverted-list access path.
    val topCells: Seq[Int] = index.centroids
      .crossJoin(broadcast(probe))
      .select(col("cell"), cosine(col("centroid"), col("probe")).as("ccos"))
      .orderBy(col("ccos").desc, col("cell"))
      .limit(nprobe)
      .select("cell")
      .collect().map(_.getInt(0)).toSeq
    // tier 1: ADC over the routed cells' packed codes only — a static
    // partition-key predicate on the sunk artifact
    val survivors = codes
      .filter(col("cell").isin(topCells: _*))
      .select(col("vec_id"),
        (adcExpr(lut, m) * 1e6).cast("long").as("adc_micro"))
      .orderBy(col("adc_micro").asc, col("vec_id"))
      .limit(topR)
      .select("vec_id")
    // tier 2: exact rerank of the survivors (the pqRerank shape)
    embeddings.join(broadcast(survivors), Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine(col("embedding"), col("probe")).as("rawcos"))
      .orderBy(col("rawcos").desc, col("vec_id"))
      .limit(kNn)
      .select(col("vec_id"), round(col("rawcos"), 6).as("cos"))
  }

  /** `sim_ann_ivfpq_batch`: the batch-probe form of [[annIvfPq]] — N
    * probes route, ADC-score and rerank in ONE pass each over the
    * shared artifacts (the [[annIvfPqBatch]]-vs-[[ivfProbeBatch]]
    * relationship mirrors annIvfBatch-vs-annIvf): per-probe top cells
    * come from one nlist × nProbes cross join; the routed codes join
    * fans each cell's codes to the probes that chose it (one codes-
    * artifact scan serves ALL probes); the per-probe ADC reads a
    * 3-level LUT literal (probe → subspace → code, nProbes·m·k doubles
    * — driver-computed from one bounded collect); survivors rerank with
    * exact cosine per probe. Broadcast sides are bounded by
    * nProbes·nprobe (routing pairs) and nProbes·topR (survivors).
    * Dynamically oracled ([[graft.OracleGen.ivfPqBatchSql]]): per-probe
    * LUT chains replay as CASE arms in the identical float order.
    * Defaults must stay in lockstep with the generator.
    * scan-guard: sim_ann_ivfpq_batch */
  def annIvfPqBatch(embeddings: DataFrame, nProbes: Int = 5, kNn: Int = 10,
                    topR: Int = 50, nlist: Int = 8, nprobe: Int = 4,
                    m: Int = 8, k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val index = cachedIvfIndex(embeddings, nlist)
    val luts = pqProbeLutBatch(embeddings, nProbes, m, k)
    val codes = ivfPqCodes(embeddings, nlist, m, k)
    val probes = embeddings.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))
    val wCell = Window.partitionBy("probe_id")
      .orderBy(col("ccos").desc, col("cell"))
    // routing COLLECTED (r18, VERDICT r17 #2): nProbes·nprobe pairs of
    // driver arithmetic; the distinct routed cells become a literal IN
    // on the cell-partitioned codes artifact (static PartitionFilters
    // directory pruning — one artifact read opens only the union of the
    // probes' cells), and the pair table re-enters the plan as a local
    // relation for the cell→probe fan-out join.
    val probeCellRows: Seq[(Long, Int)] = index.centroids
      .crossJoin(probes)
      .select(col("probe_id"), col("cell"),
        cosine(col("centroid"), col("probe")).as("ccos"))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= nprobe)
      .select("probe_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val routedCells = probeCellRows.map(_._2).distinct.sorted
    val probeCells = embeddings.sparkSession
      .createDataFrame(probeCellRows).toDF("probe_id", "cell")
    val lut3d = typedlit(luts.map(_.map(_.toSeq)))
    val pidx = (col("probe_id") + 1).cast("int")
    val adc = (0 until m).map { j =>
      element_at(element_at(element_at(lut3d, pidx), j + 1),
        (shiftright(col(pqCodeNames(m)(j / 16)), 4 * (j % 16))
          .bitwiseAND(lit(15L)) + 1).cast("int"))
    }.reduce(_ + _)
    val wAdc = Window.partitionBy("probe_id")
      .orderBy(col("adc_micro").asc, col("vec_id"))
    val survivors = codes
      .filter(col("cell").isin(routedCells: _*))
      .join(broadcast(probeCells), Seq("cell"))
      .select(col("probe_id"), col("vec_id"),
        (adc * 1e6).cast("long").as("adc_micro"))
      .withColumn("srn", row_number().over(wAdc))
      .filter(col("srn") <= topR)
      .select("probe_id", "vec_id")
    val wK = Window.partitionBy("probe_id")
      .orderBy(col("rawcos").desc, col("vec_id"))
    embeddings.join(broadcast(survivors), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosine(col("embedding"), col("probe")).as("rawcos"))
      .withColumn("rn", row_number().over(wK))
      .filter(col("rn") <= kNn)
      .select(col("probe_id"), col("vec_id"),
        round(col("rawcos"), 6).as("cos"), col("rn"))
      .orderBy("probe_id", "rn")
  }

  /** Re-ingestion corpus for the oracled embedding near-dup queries:
    * the embeddings table plus an id-shifted copy of every `every`-th
    * vector — the deterministic simulation of a re-crawled/re-ingested
    * shard, which is exactly the situation embedding dedup exists for.
    * The generated data's vectors are near-orthogonal (max pairwise
    * cosine ≈ 0.51 at the gate's scale), so the unplanted corpus has NO
    * pair above any honest near-dup threshold and the oracle match was
    * vacuous through round 6 (r6 verdict coverage caveat); the planted
    * copies make the driver gate exercise the nonempty path end to end
    * (pair detection AND the cluster closure) with hash verification.
    * Mirrored verbatim in the generated oracle SQL
    * ([[graft.OracleGen]] `reingestedCorpusCte`): same modulus, same
    * offset, so DuckDB replays band assignment and scoring over the
    * identical corpus. Map-only (a filter + union of the scan — no
    * shuffle), and the copies are ~2% of the corpus at any scale. */
  def withReingested(embeddings: DataFrame, every: Long = 50L,
                     idOffset: Long = 1000000L): DataFrame = {
    val base = embeddings.select(col("vec_id"), col("embedding"))
    base.unionAll(
      base.filter(col("vec_id") % every === 0)
        .select((col("vec_id") + idOffset).as("vec_id"), col("embedding")))
  }


  /** `dedup_near_embedding`: embedding-cosine near-duplicate pairs via
    * BANDED sign-LSH blocking — candidate pairs share a (band, bucket)
    * key in ANY of `nBands` independent projections, then exact cosine
    * verifies. Avoids the O(n²) crossJoin: the join is bucket-equi per
    * band; candidate rows carry only (band-key, vec_id) longs and the
    * embeddings re-attach to the DEDUPED candidate set.
    *
    * Why banded + corpus-scaled bits (sf10 shakeout finding): a single
    * fixed-width bucket makes candidate volume n²/2^bits — linear bucket
    * population, quadratic pairs; at 200k vectors and 6 bits that is
    * ~3·10⁸ pairs in one straggler task. `bitsPerBand < 0` (the default)
    * derives the width from the corpus count so the EXPECTED bucket
    * population stays ~64 (`bits = ceil(log2(n/64))`, clamped [6, 24] —
    * pairs ≈ 32n per band), and the `nBands` OR-amplification restores
    * the recall that narrower buckets cost. The oracled registration
    * pins explicit (nBands = 4, bitsPerBand = 6) so the generated SQL
    * is corpus-independent.
    *
    * HOT-BUCKET cap (`maxBucket`, the [[graft.operators.DedupOps
    * .ngramJaccard]] maxDf analog): sign-LSH over CLUSTERED embeddings —
    * the realistic case; semantic corpora cluster by topic — is NOT
    * uniform: a topical cluster can agree on every plane of a band and
    * land 10⁴+ members in ONE bucket, i.e. ~10⁸ pairs in one task (the
    * sf10 shakeout hit a 4 GB page request + spill-to-disk-full exactly
    * this way). Buckets holding more than `maxBucket` vectors are dense
    * topical regions, not duplicate groups, and are dropped from pair
    * enumeration — bounding pairs per bucket at maxBucket²/2 and per-task
    * state at a constant, at the recall cost that a dup pair hiding in a
    * dense region in EVERY band is missed (same trade as maxDf; raise
    * maxBucket or nBands to trade compute for recall). The cap cannot
    * bind at the oracle gate's scale (500 vectors < maxBucket), so the
    * generated SQL stays cap-free and exact there.
    *
    * Oracled exactly via the generated coefficient SQL
    * ([[graft.OracleGen.nearDupEmbeddingSql]]); ScalaTest checks planted
    * near-duplicate pairs are found. */
  def nearDupEmbedding(embeddings: DataFrame, tau: Double = 0.95,
                       dim: Int = 64, nBands: Int = 4,
                       bitsPerBand: Int = -1, maxBucket: Int = 1024): DataFrame = {
    val bits =
      if (bitsPerBand > 0) bitsPerBand
      else {
        // parquet metadata count: cheap, no data scan
        val n = math.max(1L, embeddings.count())
        math.min(24, math.max(6,
          math.ceil(math.log(n / 64.0) / math.log(2)).toInt))
      }
    val banded = embeddings.select(col("vec_id"),
      explode(lshBands(col("embedding"), dim, nBands, bits)).as("bk"))
    // constant-state count per (band, bucket); dense buckets drop BEFORE
    // any pair materializes
    val smallBuckets = banded.groupBy("bk").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") <= maxBucket).select("bk")
    val pruned = banded.join(smallBuckets, Seq("bk"), "left_semi")
    val cand = pruned.select(col("bk"), col("vec_id").as("id_a"))
      .join(pruned.select(col("bk"), col("vec_id").as("id_b")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(embeddings.select(col("vec_id").as("id_a"),
        col("embedding").as("emb_a")), "id_a")
      .join(embeddings.select(col("vec_id").as("id_b"),
        col("embedding").as("emb_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("emb_a"), col("emb_b")), 6).as("cos"))
      .filter(col("cos") >= tau)
      .orderBy("id_a", "id_b")
  }

  /** `vec_quantize_int8`: symmetric per-vector int8 quantization — the
    * 4× embedding-store compression every large-scale ANN deployment
    * applies before indexing (scale = max|x|/127; code = round(x/scale),
    * so codes span [-127, 127] and reconstruction error is ≤ scale/2 per
    * dimension). Emits the quantization manifest per vector (scale, code
    * checksums) rather than the code arrays themselves — the gate's row
    * sorter can't hash array cells (same reason `sample_bottomk` emits
    * checksums), and the sums pin every code value anyway.
    *
    * Map-only at scan speed: all arithmetic is per-row array HOFs, no
    * shuffle, no UDF. Cross-engine determinism: float→double widening is
    * exact, division/rounding are IEEE-deterministic on identical inputs,
    * and per-vector HOF sums reduce in array-index order on both engines
    * — no order-sensitive float reduction anywhere. Zero vectors get
    * scale 0 and all-zero codes (NULL-free by construction). */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    val t = embeddings.select(
      col("vec_id"), col("embedding"),
      size(col("embedding")).as("n_dims"),
      array_max(transform(col("embedding"), x => abs(x.cast("double"))))
        .as("max_abs"))
    val codes = transform(col("embedding"),
      x => round(x.cast("double") / (col("max_abs") / lit(127.0))).cast("long"))
    t.select(
        col("vec_id"), col("n_dims"),
        round(col("max_abs") / lit(127.0), 9).as("scale"),
        when(col("max_abs") > 0,
          aggregate(codes, lit(0L), (a, x) => a + x)).otherwise(lit(0L))
          .as("code_sum"),
        when(col("max_abs") > 0,
          aggregate(transform(col("embedding"),
            x => abs(round(x.cast("double") / (col("max_abs") / lit(127.0)))
              .cast("long"))), lit(0L), (a, x) => a + x)).otherwise(lit(0L))
          .as("code_abs_sum"),
        when(col("max_abs") > 0, array_max(codes)).otherwise(lit(0L))
          .as("code_max"))
      .orderBy("vec_id")
  }

  /** `emb_centroid_drift` (round 8): per-label centroid cosine against
    * the global corpus centroid — the embedding-space drift diagnostic a
    * training-data pipeline runs per source/shard/snapshot ("did this
    * slice move away from the corpus center?"); a label whose centroid
    * cosine drops between snapshots signals distribution shift before
    * any downstream metric does.
    *
    * Cosine is scale-invariant, so the per-label SUM vector stands in
    * for the mean and no division ever happens before the final cosine.
    * Cross-engine exactness: float components are widened to double,
    * rounded to 7dp, and summed as DECIMAL(18,7) — exact and
    * order-independent, where a double sum over corpus rows would be
    * partition-order-dependent (the same reason `sampleNeyman` refuses
    * streaming stddev). Dot products between the (label, pos) sums and
    * the global sums stay in DECIMAL (exact) and only the final
    * cosine division runs in double, on identical operands both engines.
    *
    * Scale shape: posexplode fans each vector into dim rows, but the
    * map-side partial aggregate collapses them to labels×dim before the
    * ONE shuffle; the dim-row global table broadcasts back. Nothing
    * corpus-sized crosses the wire — this is the elementwise-aggregate
    * analog of `extractFeatures`' histogram shape. */
  def centroidDrift(embeddings: DataFrame): DataFrame = {
    val q = round(col("v").cast("double"), 7).cast("decimal(18,7)")
    // pinned: the labels×dim sum table feeds both the global-centroid agg
    // and the dot products — unpinned, the corpus explode runs twice
    val s = graft.plans.PlanPins.lazyPin(embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(sum(q).cast("decimal(18,7)").as("s")))
    val g = s.groupBy("pos").agg(sum(col("s")).cast("decimal(18,7)").as("g"))
    val nvecs = embeddings.groupBy("label").agg(count(lit(1)).as("n_vecs"))
    s.join(broadcast(g), "pos")
      .groupBy("label")
      .agg(sum(col("s") * col("g")).as("sg"),
        sum(col("s") * col("s")).as("ss"),
        sum(col("g") * col("g")).as("gg"))
      .join(broadcast(nvecs), "label")
      .select(col("label"), col("n_vecs"),
        round(col("sg").cast("double") /
          (sqrt(col("ss").cast("double")) * sqrt(col("gg").cast("double"))),
          6).as("centroid_cos"))
      .orderBy("label")
  }

  /** `emb_dim_stats`: per-DIMENSION mean/variance of the embedding
    * space — the monitoring table every embedding pipeline keeps
    * (collapsed dimensions → a broken encoder; drifting means between
    * snapshots → re-embedding needed; per-dim variance feeds whitening
    * and product-quantization codebook decisions).
    *
    * Scale shape: posexplode fans each vector to `dim` rows but the
    * partial aggregate collapses them map-side to dims × partitions
    * before the one shuffle of O(dims) rows — the corpus is scanned
    * once and never moved. Exactness: the `emb_centroid_drift` device —
    * each element 7dp-quantized to DECIMAL(18,7), so Σv and Σv² are
    * order-free exact decimal sums; mean/variance convert the exact
    * sums to double in ONE mirrored expression (q/n − (s/n)²) and round
    * 6dp — bit-identical cross-engine.
    *
    * scan-guard: emb_dim_stats */
  def dimStats(embeddings: DataFrame): DataFrame = {
    val q = round(col("v").cast("double"), 7).cast("decimal(18,7)")
    val dn = col("n").cast("double")
    val mean = col("s").cast("double") / dn
    embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(q).cast("decimal(28,7)").as("s"),
        sum(q * q).cast("decimal(38,14)").as("q2"))
      .select(col("dim"), col("n"),
        round(mean, 6).as("mean"),
        round(col("q2").cast("double") / dn - mean * mean, 6).as("variance"))
      .orderBy("dim")
  }

  /** `emb_covariance`: the exact dim×dim covariance matrix of the
    * embedding space (upper triangle, i ≤ j) — the input to PCA /
    * whitening / product-quantization codebook fits, and the
    * off-diagonal complement of [[dimStats]]'s per-dim variance
    * (strongly correlated dims ⇒ the encoder wastes capacity; a
    * whitening transform needs exactly this matrix).
    *
    * ONE corpus pass via the augmented-vector trick: pair sums over
    * [1, x₀..x₆₃] yield per-dim sums Σxⱼ at (0,j+1) and product sums
    * Σxᵢxⱼ at (i+1,j+1) — a single explode+aggregate instead of
    * separate sums / products passes (n rides every cell's count).
    *
    * Exactness — the round-10 form rounded each double PRODUCT
    * (`round(x·y, 7)`) and emitted `round(cov, 6)` doubles; the driver
    * hash-failed it on ONE cell where DuckDB's binary round yielded
    * `-0.0` and Spark's string-based round `+0.0` (value-equal,
    * representation-different — the ts_ewma scaladoc's predicted
    * divergence). This form has no doubles at all: each augmented
    * ELEMENT is quantized ONCE to an integer in 10⁻⁷ units (65
    * roundings per vector, not 2145 — the [[dimStats]] quantize-the-
    * element device), pair products are exact BIGINT multiplies in
    * 10⁻¹⁴ units, and the output is `cov_micro` BIGINT =
    * floor((n·Σxy − ΣxΣy)·10⁶ / n²) via exact integer floor-division
    * (num − pmod(num, den)) / den — integers have no signed zero and
    * no tie to break, so the two engines agree bit-for-bit.
    *
    * Overflow discipline (ANSI mode throws, nothing saturates): a
    * per-pair product is split hi = (p − pmod(p,10⁷)) div 10⁷,
    * lo = pmod(p,10⁷) so the partial SUMS stay in codegen BIGINTs
    * (Σhi ≤ n·10⁹ for |x| ≤ 10 — safe to ~10⁹ vectors); the split is
    * recombined into one exact DECIMAL per cell AFTER the aggregate
    * (O(dim²) rows), and every decimal cast is sized so each product
    * stays ≤ precision 38 (documented at each cast).
    *
    * Scale shape: the explode fans dim·(dim+3)/2 ≈ 2.1k all-long
    * struct rows per vector, but the map-side partial aggregate
    * collapses them to O(dim²) rows per partition before the ONE
    * shuffle; the tiny sums table is lazy-pinned (three consumers:
    * pair cells + two dim-sum broadcasts — unpinned, the corpus
    * explode would run three times) and the dim-sum re-attachments
    * ride broadcasts. Nothing corpus-sized crosses the wire.
    *
    * scan-guard: emb_covariance */
  def covariance(embeddings: DataFrame, dim: Int = 64): DataFrame = {
    val M = 10000000L // 10^7: the 7dp quantization unit
    // quantized augmented vector: element 0 is the constant 1.0 → M;
    // round→DECIMAL(18,7)→·10^7 is exact (the (8,0) cast keeps the
    // decimal product at precision 27 — a bare long literal would
    // promote to (20,0) and Spark would cut the scale to 6dp)
    val qarr = concat(
      array(lit(M)),
      transform(col("embedding"), x =>
        (round(x.cast("double"), 7).cast("decimal(18,7)") *
          lit(M).cast("decimal(8,0)")).cast("long")))
    // r14: the 2145-pair fan-out is a typed PER-PARTITION accumulator,
    // not an interpreted nested-transform explode — the HOF chain
    // evaluated interpreted (never codegen) and materialized
    // |vectors|·2145 rows into the hash aggregate (~1.4·10⁹ at sf10);
    // the accumulator keeps two long arrays per partition and emits
    // O(2145) partial rows per partition, identical integer arithmetic:
    // per pair p = qᵢ·qⱼ, lo = pmod(p, M) (non-negative), hi =
    // (p − lo)/M, partials summed per partition then globally — the
    // same Σhi/Σlo/n by associativity, so the decimal reconstruction
    // below and the oracle are untouched. Bounds: |q| ≤ ~10⁸ ⇒
    // |p| ≤ 10¹⁶; per-partition Σhi ≤ rows·10⁹ — long-safe at any
    // realistic partition size (the GLOBAL sums were already the
    // binding constraint and are unchanged).
    val spark = embeddings.sparkSession
    import spark.implicits._
    val M_ = M
    val sums = graft.plans.PlanPins.lazyPin(
      embeddings.select(qarr.as("q"))
        .as[Array[Long]]
        .mapPartitions { it =>
          val d1 = dim + 1
          val nPairs = d1 * (d1 + 1) / 2
          val shi = new Array[Long](nPairs)
          val slo = new Array[Long](nPairs)
          var n = 0L
          it.foreach { q =>
            var idx = 0
            var ia = 0
            while (ia < d1) {
              val qa = q(ia)
              var ib = ia
              while (ib < d1) {
                val p = qa * q(ib)
                val lo = ((p % M_) + M_) % M_
                shi(idx) += (p - lo) / M_
                slo(idx) += lo
                idx += 1; ib += 1
              }
              ia += 1
            }
            n += 1
          }
          if (n == 0) Iterator.empty
          else {
            var idx = -1
            for {
              ia <- (0 until d1).iterator
              ib <- (ia until d1).iterator
            } yield { idx += 1; (ia, ib, shi(idx), slo(idx), n) }
          }
        }
        .toDF("ia", "ib", "phi", "plo", "pn")
        .groupBy("ia", "ib")
        .agg(sum(col("phi")).as("shi"), sum(col("plo")).as("slo"),
          sum(col("pn")).as("n")))
    // (0,j) cells: p = M·qⱼ exactly, so lo = 0 and shi IS Σqⱼ (the
    // dim sum in 10^-7 units) — no decimal division needed
    val dims = sums.filter(col("ia") === 0 && col("ib") > 0)
      .select((col("ib") - 1).as("d"), col("shi").as("s7"))
    sums.filter(col("ia") > 0)
      .select((col("ia") - 1).as("i"), (col("ib") - 1).as("j"), col("n"),
        // Σp in 10^-14 units: (19,0)·(8,0)=(28,0) exact, + slo ≤ n·10^7
        ((col("shi").cast("decimal(19,0)") * lit(M).cast("decimal(8,0)") +
          col("slo").cast("decimal(19,0)")).cast("decimal(28,0)")).as("sp"))
      .join(broadcast(dims.select(col("d").as("i"), col("s7").as("si"))),
        Seq("i"))
      .join(broadcast(dims.select(col("d").as("j"), col("s7").as("sj"))),
        Seq("j"))
      .select(col("i"), col("j"),
        // n·Σxy − ΣxᵢΣxⱼ in 10^-14 units: (9,0)·(28,0)=(38,0) and
        // (18,0)·(18,0)=(37,0), both exact; difference capped at 38
        (col("n").cast("decimal(9,0)") * col("sp") -
          col("si").cast("decimal(18,0)") * col("sj").cast("decimal(18,0)"))
          .as("num"),
        // n²·10^8: cov_micro = num·10^6/(n²·10^14·10^-14·10^6) — i.e.
        // micro-units need num/(n²·10^8); (12,0)²·(9,0)=(35,0) exact
        (col("n").cast("decimal(12,0)") * col("n").cast("decimal(12,0)") *
          lit(100000000L).cast("decimal(9,0)")).as("den"))
      .select(col("i"), col("j"),
        // exact integer floor-division: num − pmod(num,den) is an exact
        // multiple of den, so the decimal divide is representation-exact
        ((col("num") - pmod(col("num"), col("den"))) / col("den"))
          .cast("long").as("cov_micro"))
      .orderBy("i", "j")
  }

  /** `emb_dim_quantiles`: EXACT per-dimension p01/p50/p99 of the
    * embedding elements — the clipping/winsorizing table a vector
    * pipeline derives before int8 quantization (`vec_quantize_int8`
    * clips at min/max; real deployments clip at percentiles so one
    * outlier doesn't waste the int8 range) and the drift baseline
    * `emb_dim_stats`' moments can't give (quantiles see shape).
    * Elements are quantized ONCE to exact BIGINT 10⁻⁷ units (the
    * emb_covariance device — no doubles cross an engine boundary); the
    * p-th quantile is the element at rank ceil(p·n/100) in value
    * order, a selection both engines resolve identically (ties share a
    * value, so tie ORDER cannot change the answer).
    *
    * Scale shape — the agg_weighted_median two-pass DISTRIBUTED
    * SELECTION, generalized to 3 quantiles × dim groups (a raw
    * rank-window would sort n rows per dimension — the measured
    * 57-s-at-sf10 shape this pattern replaced): pass 1 histograms
    * counts per (dim, fixed value bucket) — map-side collapse to
    * O(dim·buckets) rows — and locates each target's bucket and
    * below-weight on the tiny cumulative table; pass 2 re-scans only
    * the ≤ 3 selected buckets per dimension (a broadcast join) and
    * rank-picks inside those ~1/buckets slices. The corpus is scanned
    * exactly twice — guarded.
    *
    * scan-guard: emb_dim_quantiles */
  def dimQuantiles(embeddings: DataFrame,
                   bucketWidth: Long = 16384L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q7 = (round(col("x").cast("double"), 7).cast(DecimalType(18, 7)) *
      lit(10000000L).cast(DecimalType(8, 0))).cast("long")
    val el = embeddings
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d"), q7.as("q7"))
      .withColumn("bucket", expr(s"q7 DIV $bucketWidth"))
    val wb = el.groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("d").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val sel = wb
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wTot))
      .select(col("d"), col("bucket"), col("cnt"), col("cum"), col("n"),
        explode(array(lit(1), lit(50), lit(99))).as("p"))
      .withColumn("r", expr("(p * n + 99) DIV 100"))
      .filter(col("cum") >= col("r"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("d", "p").orderBy("bucket")))
      .filter(col("rk") === 1)
      .select(col("d"), col("p"), col("bucket"),
        (col("cum") - col("cnt")).as("wbelow"), col("r"), col("n"))
    val wIn = Window.partitionBy("d", "p").orderBy("q7")
    el.join(broadcast(sel), Seq("d", "bucket"))
      .withColumn("rn", row_number().over(wIn))
      .filter(col("rn") === col("r") - col("wbelow"))
      .groupBy("d")
      .agg(max(col("n")).as("n"),
        max(when(col("p") === 1, col("q7"))).as("p01_e7"),
        max(when(col("p") === 50, col("q7"))).as("p50_e7"),
        max(when(col("p") === 99, col("q7"))).as("p99_e7"))
      .orderBy("d")
  }

  /** `emb_pca_top`: top principal component of the embedding space —
    * the first step of whitening, PCA-dim-reduction, and the classic
    * "dominant direction" diagnostic (a rogue feature or duplicated
    * template shows up as one huge eigenvalue). Emits the top-`topK`
    * vectors by |projection onto the top PC| with their scores in
    * micro-units, plus the eigenvalue — the outlier list a curation
    * pass reviews.
    *
    * Architecture — the driver/cluster split that holds at 100 TB:
    *  1. DISTRIBUTED: the exact [[covariance]] sufficient statistics
    *     (one corpus scan, map-side collapse to O(dim²) cells);
    *  2. DRIVER: collect the dim·(dim+1)/2 cells (~2k rows at dim 64 —
    *     the Skew-boundary/KMeans collect pattern, O(dim²) NEVER
    *     O(corpus)) and power-iterate the dense matrix (deterministic
    *     all-ones start, fixed `iters`, sign pinned by making the
    *     largest-|coordinate| positive);
    *  3. DISTRIBUTED: broadcast the eigenvector as literals and score
    *     every embedding in one map-only pass; centering is a constant
    *     shift (dot(x−μ, v) = dot(x,v) − dot(μ,v)), so the mean rides
    *     a 1-row broadcast from a narrow 64-avg aggregate. Top-k is a
    *     TakeOrdered, never a global sort.
    *
    * Three corpus scans total (covariance, mean, projection), each
    * map-collapsing before its shuffle. No oracle (✗): the eigensolve
    * is an iterative float computation — PcaSpec recovers a PLANTED
    * dominant axis (|cos| > 0.99), pins the deterministic sign
    * convention, and checks the score extremes land on the planted
    * outliers. The covariance pin is released here after the collect
    * (the caller's release walk cannot reach it from the projection
    * plan).
    *
    * scan-guard: exempt (covariance and the mean aggregate execute at
    * construction time behind driver collects; the result plan carries
    * only the single projection scan) */
  /** The driver-side eigensolve of [[pcaTop]], exported (r15) so the
    * dynamic oracle can inline the CONVERGED axis as literals and replay
    * the distributed scoring pass in DuckDB (the fit itself stays
    * unoracled — VERDICT r14 #4). Deterministic end to end: the
    * covariance input is exact integer micro-units, the power iteration
    * is pure driver math from a fixed start, the mean ride is one
    * fixed-plan aggregate — two calls in one session return identical
    * (v, shift, lambda). */
  private[graft] def pcaAxis(embeddings: DataFrame, dim: Int = 64,
                             iters: Int = 100): (IndexedSeq[Double], Double, Double) = {
    val cov = covariance(embeddings, dim)
    val cells = cov.collect()
    org.apache.spark.sql.graftbridge.ColumnBridge.releaseAllCheckpoints(cov)
    val c = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = r.getLong(2) / 1e6
      c(i)(j) = v; c(j)(i) = v
    }
    var v = Array.fill(dim)(1.0 / math.sqrt(dim))
    var lambda = 0.0
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => c(i)(j) * v(j)).sum)
      lambda = math.sqrt(w.map(x => x * x).sum)
      if (lambda > 0) v = w.map(_ / lambda)
    }
    // deterministic sign: the largest-|coordinate| axis points positive
    val pivot = (0 until dim).maxBy(i => (math.abs(v(i)), -i))
    if (v(pivot) < 0) v = v.map(-_)
    val mean = embeddings.select(
      (0 until dim).map(d =>
        avg(element_at(col("embedding"), d + 1).cast("double")).as(s"m$d")): _*)
      .collect()(0)
    val shift = (0 until dim).map(d => mean.getDouble(d) * v(d)).sum
    (v.toIndexedSeq, shift, lambda)
  }

  def pcaTop(embeddings: DataFrame, dim: Int = 64, topK: Int = 20,
             iters: Int = 100): DataFrame = {
    val (v, shift, lambda) = pcaAxis(embeddings, dim, iters)
    val score = (0 until dim).map(d =>
      element_at(col("embedding"), d + 1).cast("double") * lit(v(d)))
      .reduce(_ + _) - lit(shift)
    embeddings
      .select(col("vec_id"), (score * 1e6).cast("long").as("score_micro"),
        lit(math.round(lambda * 1e6)).as("eigenvalue_micro"))
      .orderBy(abs(col("score_micro")).desc, col("vec_id"))
      .limit(topK)
  }
}
