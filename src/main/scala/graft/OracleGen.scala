package graft

import graft.operators.VectorOps

/** Generated DuckDB oracle SQL for the sign-LSH queries.
  *
  * These queries are "approximate" only in the recall sense — their
  * RESULTS are fully deterministic, because the LSH hyperplanes are pure
  * functions of (plane, dimension) indices
  * ([[VectorOps.planeCoefficients]]). Inlining the same coefficients
  * into SQL makes DuckDB compute bit-identical band buckets (double
  * literals round-trip exactly; `list_dot_product` on DOUBLE[] matches
  * the compiled sequential-fold DotProductExpr), so the whole
  * candidate-generation + scoring pipeline is exactly oracle-checkable.
  * The price is ~30 KB of SQL per query — all constants.
  */
object OracleGen {

  /** SQL for one band bucket: sum of sign bits over `bits` planes. `e`
    * names a DOUBLE[] column in scope. */
  private def bucketSql(e: String, bits: Int, seed: Int, dim: Int): String =
    (0 until bits).map { p =>
      val arr = VectorOps.planeCoefficients(p, seed, dim).mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product($e, $arr) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  private def bandCols(nBands: Int, bitsPerBand: Int, dim: Int): String =
    (0 until nBands)
      .map(b => s"(${bucketSql("e", bitsPerBand, b * 7919, dim)}) AS bk_$b")
      .mkString(",\n    ")

  private def anyBandEq(nBands: Int, l: String, r: String): String =
    (0 until nBands).map(b => s"$l.bk_$b = $r.bk_$b").mkString(" OR ")

  // zero-norm-guarded like VectorOps.cosine (NULL, excluded/sorted-last
  // on both engines) — see nullCos below; defined here as a lazy val so
  // the LSH oracles can reference it before nullCos's declaration site
  private lazy val cosSql = nullCos("e.e", "pv.pe")

  /** Oracle for `sim_ann_lsh` (probe vec_id = 0, k = 10, 6 bands × 4
    * bits — must track the VectorOps.annLsh defaults). */
  def simAnnLshSql(nBands: Int = 6, bitsPerBand: Int = 4, dim: Int = 64): String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |bands AS (
       |  SELECT vec_id,
       |    ${bandCols(nBands, bitsPerBand, dim)}
       |  FROM emb),
       |probe AS (SELECT * FROM bands WHERE vec_id = 0),
       |cand AS (
       |  SELECT DISTINCT b.vec_id FROM bands b, probe p
       |  WHERE ${anyBandEq(nBands, "b", "p")}),
       |pv AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
       |scored AS (
       |  SELECT c.vec_id, $cosSql AS rawcos
       |  FROM cand c JOIN emb e USING (vec_id), pv)
       |SELECT vec_id, round(rawcos, 6) AS cos FROM scored
       |ORDER BY rawcos DESC, vec_id LIMIT 10""".stripMargin

  /** Oracle for `sim_ann_lsh_batch` (probes vec_id < 5, k = 10, 8 bands
    * × 3 bits — must track the VectorOps.annLshBatch defaults). */
  def simAnnLshBatchSql(nBands: Int = 8, bitsPerBand: Int = 3, dim: Int = 64): String =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |bands AS (
       |  SELECT vec_id,
       |    ${bandCols(nBands, bitsPerBand, dim)}
       |  FROM emb),
       |probes AS (SELECT * FROM bands WHERE vec_id < 5),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS probe_id, b.vec_id FROM bands b, probes p
       |  WHERE ${anyBandEq(nBands, "b", "p")}),
       |pv AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id < 5),
       |scored AS (
       |  SELECT c.probe_id, c.vec_id, $cosSql AS rawcos
       |  FROM cand c JOIN emb e USING (vec_id) JOIN pv USING (probe_id)),
       |r AS (
       |  SELECT probe_id, vec_id, rawcos,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY rawcos DESC, vec_id) AS INTEGER) AS rn
       |  FROM scored)
       |SELECT probe_id, vec_id, round(rawcos, 6) AS cos, rn
       |FROM r WHERE rn <= 10 ORDER BY probe_id, rn""".stripMargin

  /** Shared CTE chain for the banded sign-LSH near-dup pair detector —
    * used by both the pair oracle and the clusters-closure oracle. The
    * corpus CTE mirrors [[graft.operators.VectorOps.withReingested]]
    * verbatim (same modulus, same id offset): the generated data's
    * vectors are near-orthogonal, so without the planted re-ingested
    * copies both oracles were vacuously green on 0 rows (r6 verdict). */
  private def nearDupEmbeddingCtes(nBands: Int, bitsPerBand: Int,
                                   dim: Int): String =
    s"""corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
       |  WHERE vec_id % 50 = 0),
       |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM corpus),
       |bands AS (
       |  SELECT vec_id,
       |    ${bandCols(nBands, bitsPerBand, dim)}
       |  FROM emb),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.vec_id < b.vec_id AND (${anyBandEq(nBands, "a", "b")})),
       |scored AS (
       |  SELECT c.id_a, c.id_b,
       |    round(${nullCos("ea.e", "eb.e")}, 6) AS cos
       |  FROM cand c
       |  JOIN emb ea ON ea.vec_id = c.id_a
       |  JOIN emb eb ON eb.vec_id = c.id_b)""".stripMargin

  /** Oracle for `dedup_near_embedding` (τ = 0.95 on the ROUNDED cosine,
    * BANDED as of round 5: 4 bands × 6 bits, band seeds b·7919 — must
    * track the explicit params SparkEntry pins in the registration). */
  def nearDupEmbeddingSql(nBands: Int = 4, bitsPerBand: Int = 6,
                          dim: Int = 64, tau: Double = 0.95): String =
    s"""WITH ${nearDupEmbeddingCtes(nBands, bitsPerBand, dim)}
       |SELECT id_a, id_b, cos FROM scored
       |WHERE cos >= $tau ORDER BY id_a, id_b""".stripMargin

  /** Oracle for `dedup_embedding_clusters` — transitive closure over the
    * verified embedding near-dup pairs (same recursive-CTE shape as the
    * jaccard/minhash clusters oracles). */
  def embeddingClustersSql(nBands: Int = 4, bitsPerBand: Int = 6,
                           dim: Int = 64, tau: Double = 0.95): String =
    s"""WITH RECURSIVE ${nearDupEmbeddingCtes(nBands, bitsPerBand, dim)},
       |vpairs AS (SELECT id_a, id_b FROM scored WHERE cos >= $tau),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM vpairs
       |  UNION SELECT id_b, id_a FROM vpairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  // ---- IVF / PCA dynamic oracles (r15) --------------------------------
  // Unlike the LSH hyperplanes, the IVF centroids and the PCA axis are
  // FITTED model state — pure functions of the data, not of indices. The
  // fit stays unoracled (KMeans / power iteration); its CONVERGED
  // parameters inline as literals at Verify dump time
  // ([[graft.SparkEntry.dynamicOracleSql]]), and DuckDB independently
  // replays the downstream plan — assignment, probe, scoring, dedup
  // keeper — bit-identically: both engines compute every float op as a
  // sequential fold over the same doubles (the Spark side's cellAssign /
  // pcaTop score are compiled sequential-fold expressions by design, NOT
  // MLlib transform's BLAS-order arithmetic, exactly so this replay can
  // exist; double literals round-trip exactly).

  /** `cos(a, b)` with the zero-norm guard pinned to −1 — tracks
    * VectorOps.cellAssign's `coalesce(cosine, -1)`. */
  private def guardedCos(a: String, b: String): String =
    s"(CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0 " +
      s"THEN -1.0 ELSE list_dot_product($a, $b) / " +
      s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END)"

  /** `cos(a, b)` with the zero-norm guard pinned to NULL — tracks
    * VectorOps.cosine exactly (r16, ADVICE r15: the raw division gave
    * NaN in DuckDB, which compares greater than any τ and sorts first
    * under DESC, where Spark's NULL is excluded by comparisons and
    * sorts last). DuckDB's default null ordering is NULLS LAST, same
    * as Spark's for DESC sorts, so ranking positions also agree. */
  private def nullCos(a: String, b: String): String =
    s"(CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) = 0 " +
      s"THEN NULL ELSE list_dot_product($a, $b) / " +
      s"(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))) END)"

  /** Shared IVF CTE chain over a `corpus(vec_id, embedding)` CTE already
    * in scope: centroid VALUES table → per-vector argmax-cosine cell
    * assignment (ties to the smallest cell — VectorOps.cellAssign's
    * least-struct order). */
  private def ivfCtes(centers: Seq[Seq[Double]]): String = {
    val values = centers.zipWithIndex.map { case (c, i) =>
      s"($i, ${c.mkString("[", ",", "]")}::DOUBLE[])"
    }.mkString(",\n      ")
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM corpus),
       |cents AS (SELECT cell, c FROM (VALUES
       |      $values) t(cell, c)),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, cn.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${guardedCos("e.e", "cn.c")} DESC, cn.cell) AS arn
       |    FROM emb e CROSS JOIN cents cn) z WHERE arn = 1)""".stripMargin
  }

  /** Oracle for `sim_ann_ivf` given the fitted centers (probe vec_id = 0,
    * k = 10, nprobe = 4 — must track VectorOps.annIvf defaults). */
  def simAnnIvfSql(centers: Seq[Seq[Double]], nprobe: Int = 4,
                   k: Int = 10): String =
    s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
       |${ivfCtes(centers)},
       |pv AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
       |topcells AS (
       |  SELECT cell FROM cents, pv
       |  ORDER BY ${nullCos("c", "pe")} DESC, cell
       |  LIMIT $nprobe),
       |scored AS (
       |  SELECT a.vec_id, ${nullCos("e.e", "pv.pe")} AS rawcos
       |  FROM asg a JOIN topcells USING (cell)
       |  JOIN emb e ON e.vec_id = a.vec_id, pv)
       |SELECT vec_id, round(rawcos, 6) AS cos FROM scored
       |ORDER BY rawcos DESC, vec_id LIMIT $k""".stripMargin

  /** Oracle for `sim_ann_ivf_batch` (probes vec_id < 5, k = 10,
    * nprobe = 4 — must track VectorOps.annIvfBatch defaults). */
  def simAnnIvfBatchSql(centers: Seq[Seq[Double]], nProbes: Int = 5,
                        nprobe: Int = 4, k: Int = 10): String =
    s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
       |${ivfCtes(centers)},
       |pv AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id < $nProbes),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT pv.probe_id, cn.cell,
       |      row_number() OVER (PARTITION BY pv.probe_id
       |        ORDER BY ${nullCos("cn.c", "pv.pe")} DESC,
       |        cn.cell) AS crn
       |    FROM cents cn CROSS JOIN pv) z WHERE crn <= $nprobe),
       |scored AS (
       |  SELECT p.probe_id, a.vec_id, ${nullCos("e.e", "pv.pe")} AS rawcos
       |  FROM asg a JOIN pcells p USING (cell)
       |  JOIN emb e ON e.vec_id = a.vec_id
       |  JOIN pv ON pv.probe_id = p.probe_id),
       |r AS (
       |  SELECT probe_id, vec_id, rawcos,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY rawcos DESC, vec_id) AS INTEGER) AS rn
       |  FROM scored)
       |SELECT probe_id, vec_id, round(rawcos, 6) AS cos, rn
       |FROM r WHERE rn <= $k ORDER BY probe_id, rn""".stripMargin

  /** Oracle for `dedup_semantic_ivf` given the fitted centers — the
    * SemDeDup pass over the re-ingested corpus: within-cell pairs at
    * cos ≥ τ, transitive closure, per-group keeper = lowest rounded
    * centroid-cosine (ties to the smallest vec_id). Must track
    * DedupOps.semanticIvf defaults (τ = 0.95, maxCell = 8192) and the
    * withReingested registry input. */
  def semanticIvfSql(centers: Seq[Seq[Double]], tau: Double = 0.95,
                     maxCell: Int = 8192): String =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
       |  WHERE vec_id % 50 = 0),
       |${ivfCtes(centers)},
       |cellcnt AS (SELECT cell, COUNT(*) AS cnt FROM asg GROUP BY cell),
       |pruned AS (
       |  SELECT a.vec_id, a.cell FROM asg a
       |  JOIN cellcnt c USING (cell) WHERE c.cnt <= $maxCell),
       |vpairs AS (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM pruned x JOIN pruned y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN emb ex ON ex.vec_id = x.vec_id
       |  JOIN emb ey ON ey.vec_id = y.vec_id
       |  WHERE ${nullCos("ex.e", "ey.e")} >= $tau),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM vpairs
       |  UNION SELECT id_b, id_a FROM vpairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |grp AS (SELECT a AS vec_id, least(a, min(b)) AS cluster
       |        FROM reach GROUP BY a),
       |sims AS (
       |  SELECT a.vec_id, a.cell,
       |    round(${nullCos("e.e", "cn.c")}, 6)
       |      AS cos_centroid
       |  FROM asg a JOIN emb e ON e.vec_id = a.vec_id
       |  JOIN cents cn USING (cell)),
       |lab AS (
       |  SELECT s.vec_id, s.cell, s.cos_centroid,
       |    COALESCE(g.cluster, -s.vec_id - 1) AS grp
       |  FROM sims s LEFT JOIN grp g ON g.vec_id = s.vec_id)
       |SELECT vec_id, cell, grp, cos_centroid,
       |  CAST(CASE WHEN row_number() OVER (PARTITION BY grp
       |    ORDER BY cos_centroid ASC, vec_id ASC) = 1 THEN 1 ELSE 0 END
       |    AS INTEGER) AS keep
       |FROM lab ORDER BY vec_id""".stripMargin

  /** Oracle for `emb_pca_top` given the converged axis: replay the
    * map-only scoring pass (left-assoc per-dim chain, the exact float
    * order of pcaTop's reduce) over the inlined eigenvector + mean
    * shift; trunc-toward-zero matches Spark's double→long cast. */
  def pcaTopSql(v: Seq[Double], shift: Double, lambdaMicro: Long,
                topK: Int = 20): String = {
    val chain = v.zipWithIndex
      .map { case (w, d) => s"e[${d + 1}] * $w" }
      .mkString("(", " + ", ")")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (
       |  SELECT vec_id,
       |    CAST(trunc(($chain - $shift) * 1e6) AS BIGINT) AS score_micro
       |  FROM emb)
       |SELECT vec_id, score_micro,
       |  CAST($lambdaMicro AS BIGINT) AS eigenvalue_micro
       |FROM s ORDER BY abs(score_micro) DESC, vec_id LIMIT $topK""".stripMargin
  }

  // ---- PQ (product quantization) dynamic oracles (r15) ----------------
  // Same device as the IVF family: the m per-subspace KMeans fits stay
  // unoracled; the exported centers inline as literals, and DuckDB
  // replays assignment (argmin via struct list_sort — d then code, the
  // least-struct tie-break), packing, the reconstruction-error chain,
  // and the ADC lookup in the EXACT float order the Spark expressions
  // compute (explicit left-assoc chains, never SUM over a group whose
  // order no engine pins).

  /** Per-subspace argmin struct literal list for subspace j: the 16
    * candidates' `{'d': ccᵢ − 2·x_j·cᵢ, 'c': i}` structs, sorted; `[1]`
    * is the winner. */
  private def pqSubSql(cb: graft.operators.VectorOps.PqCodebook,
                       j: Int): String = {
    val lo = j * cb.dsub + 1
    val hi = j * cb.dsub + cb.dsub
    val cands = cb.centers(j).zipWithIndex.map { case (c, i) =>
      val cc = c.map(x => x * x).sum
      s"{'d': $cc - 2.0 * list_dot_product(e[$lo:$hi], ${c.mkString("[", ",", "]")}::DOUBLE[]), 'c': ${i}}"
    }.mkString(",\n      ")
    s"(list_sort([\n      $cands]))[1]"
  }

  /** Oracle for `emb_pq_encode` given the fitted codebook. */
  def pqEncodeSql(cb: graft.operators.VectorOps.PqCodebook): String = {
    val subCols = (0 until cb.m)
      .map(j => s"${pqSubSql(cb, j)} AS s$j").mkString(",\n    ")
    val packed = (0 until cb.m)
      .map(j => s"CAST(s$j.c AS BIGINT) * ${1L << (4 * j)}").mkString(" + ")
    val errChain = (0 until cb.m).map(j => s"s$j.d").mkString("(", " + ", ")")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |s AS (
       |  SELECT vec_id, e,
       |    $subCols
       |  FROM emb)
       |SELECT vec_id,
       |  CAST($packed AS BIGINT) AS pq_code,
       |  CAST(trunc(($errChain + list_dot_product(e, e)) * 1000000.0) AS BIGINT)
       |    AS recon_err_micro
       |FROM s ORDER BY vec_id""".stripMargin
  }

  /** Oracle for `sim_pq_topk` given the fitted codebook AND the
    * driver-computed probe LUT (exact per-coordinate folds — the same
    * doubles the Spark plan carries as literals). */
  def pqTopKSql(cb: graft.operators.VectorOps.PqCodebook,
                lut: IndexedSeq[Seq[Double]], kNn: Int = 10): String = {
    val pq = pqEncodeSql(cb)
    val adcChain = (0 until cb.m).map { j =>
      s"list_extract(${lut(j).mkString("[", ",", "]")}::DOUBLE[], " +
        s"CAST(((pq_code >> ${4 * j}) & 15) + 1 AS INTEGER))"
    }.mkString("(", " + ", ")")
    s"""WITH codes AS (SELECT vec_id, pq_code FROM ($pq) z)
       |SELECT vec_id,
       |  CAST(trunc($adcChain * 1000000.0) AS BIGINT) AS adc_micro
       |FROM codes ORDER BY adc_micro ASC, vec_id LIMIT $kNn""".stripMargin
  }

  /** Oracle for `sim_pq_rerank` (r16): tier 1 replays [[pqTopKSql]]
    * with kNn = topR for the survivor set (identical total order →
    * identical set), tier 2 reranks survivors by exact guarded cosine —
    * the sim_cosine_topk shape bounded to the survivors. Defaults must
    * track VectorOps.pqRerank. */
  def pqRerankSql(cb: graft.operators.VectorOps.PqCodebook,
                  lut: IndexedSeq[Seq[Double]], kNn: Int = 10,
                  topR: Int = 50): String = {
    val surv = pqTopKSql(cb, lut, topR)
    s"""WITH surv AS (SELECT vec_id FROM ($surv) s),
       |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |pv AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
       |scored AS (
       |  SELECT e.vec_id, ${nullCos("e.e", "pv.pe")} AS rawcos
       |  FROM surv JOIN emb e USING (vec_id), pv)
       |SELECT vec_id, round(rawcos, 6) AS cos FROM scored
       |ORDER BY rawcos DESC, vec_id LIMIT $kNn""".stripMargin
  }

  /** Oracle for `retrieval_pq_recall` (r16): the recall_at_k
    * composition over [[pqRerankSql]] vs the exact cosine top-k. */
  def pqRecallSql(cb: graft.operators.VectorOps.PqCodebook,
                  lut: IndexedSeq[Seq[Double]], kNn: Int = 10,
                  topR: Int = 50): String = {
    val rerank = pqRerankSql(cb, lut, kNn, topR)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |pv AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
       |exact AS (
       |  SELECT e.vec_id FROM emb e, pv
       |  ORDER BY ${nullCos("e.e", "pv.pe")} DESC, e.vec_id LIMIT $kNn),
       |two AS (SELECT vec_id FROM ($rerank) t)
       |SELECT COUNT(*) AS n_exact, COUNT(t.vec_id) AS n_hit,
       |  COUNT(t.vec_id) * 1000000 // COUNT(*) AS recall_micro
       |FROM exact e LEFT JOIN two t USING (vec_id)
       |ORDER BY n_exact""".stripMargin
  }

  /** Oracle for `sim_ann_ivfpq` (r17, VERDICT r16 #2) — the composed
    * IVF+PQ ladder replayed over three literal sets: the IVF centers
    * route to `nprobe` cells (the simAnnIvfSql device), ADC over the
    * routed cells' packed codes selects `topR` survivors (the pqTopKSql
    * device restricted by the assignment join), and exact guarded
    * cosine reranks (the pqRerankSql tier 2). Defaults must track
    * VectorOps.annIvfPq. */
  def ivfPqSql(centers: Seq[Seq[Double]],
               cb: graft.operators.VectorOps.PqCodebook,
               lut: IndexedSeq[Seq[Double]], nprobe: Int = 4,
               kNn: Int = 10, topR: Int = 50): String = {
    val pq = pqEncodeSql(cb)
    val adcChain = (0 until cb.m).map { j =>
      s"list_extract(${lut(j).mkString("[", ",", "]")}::DOUBLE[], " +
        s"CAST(((pq_code >> ${4 * j}) & 15) + 1 AS INTEGER))"
    }.mkString("(", " + ", ")")
    s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
       |${ivfCtes(centers)},
       |codes AS (SELECT vec_id, pq_code FROM ($pq) z),
       |pv AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
       |topcells AS (
       |  SELECT cell FROM cents, pv
       |  ORDER BY ${nullCos("c", "pe")} DESC, cell
       |  LIMIT $nprobe),
       |routed AS (
       |  SELECT c.vec_id, c.pq_code
       |  FROM codes c JOIN asg a ON a.vec_id = c.vec_id
       |  JOIN topcells t ON t.cell = a.cell),
       |surv AS (
       |  SELECT vec_id FROM (
       |    SELECT vec_id,
       |      CAST(trunc($adcChain * 1000000.0) AS BIGINT) AS adc_micro
       |    FROM routed) r
       |  ORDER BY adc_micro ASC, vec_id LIMIT $topR),
       |scored AS (
       |  SELECT e.vec_id, ${nullCos("e.e", "pv.pe")} AS rawcos
       |  FROM surv JOIN emb e USING (vec_id), pv)
       |SELECT vec_id, round(rawcos, 6) AS cos FROM scored
       |ORDER BY rawcos DESC, vec_id LIMIT $kNn""".stripMargin
  }

  /** Oracle for `sim_ann_ivfpq_batch` (r17): the batch composition —
    * per-probe cell routing (simAnnIvfBatchSql's pcells device), ADC
    * over the routed codes with each probe's LUT chain as a CASE arm
    * (identical left-assoc float order to the Spark fold), per-probe
    * survivor rank, exact rerank. Defaults must track
    * VectorOps.annIvfPqBatch. */
  def ivfPqBatchSql(centers: Seq[Seq[Double]],
                    cb: graft.operators.VectorOps.PqCodebook,
                    luts: IndexedSeq[IndexedSeq[Seq[Double]]],
                    nProbes: Int = 5, nprobe: Int = 4,
                    kNn: Int = 10, topR: Int = 50): String = {
    val pq = pqEncodeSql(cb)
    def adcChain(lut: IndexedSeq[Seq[Double]]): String =
      (0 until cb.m).map { j =>
        s"list_extract(${lut(j).mkString("[", ",", "]")}::DOUBLE[], " +
          s"CAST(((pq_code >> ${4 * j}) & 15) + 1 AS INTEGER))"
      }.mkString("(", " + ", ")")
    val caseArms = luts.zipWithIndex.map { case (lut, p) =>
      s"      WHEN $p THEN ${adcChain(lut)}"
    }.mkString("\n")
    s"""WITH corpus AS (SELECT vec_id, embedding FROM embeddings),
       |${ivfCtes(centers)},
       |codes AS (SELECT vec_id, pq_code FROM ($pq) z),
       |pv AS (SELECT vec_id AS probe_id, e AS pe FROM emb WHERE vec_id < $nProbes),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT pv.probe_id, cn.cell,
       |      row_number() OVER (PARTITION BY pv.probe_id
       |        ORDER BY ${nullCos("cn.c", "pv.pe")} DESC,
       |        cn.cell) AS crn
       |    FROM cents cn CROSS JOIN pv) z2 WHERE crn <= $nprobe),
       |routed AS (
       |  SELECT p.probe_id, c.vec_id, c.pq_code
       |  FROM codes c JOIN asg a ON a.vec_id = c.vec_id
       |  JOIN pcells p ON p.cell = a.cell),
       |surv AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT probe_id, vec_id,
       |      row_number() OVER (PARTITION BY probe_id
       |        ORDER BY adc_micro ASC, vec_id) AS srn
       |    FROM (SELECT probe_id, vec_id,
       |      CAST(trunc((CASE probe_id
       |$caseArms
       |      END) * 1000000.0) AS BIGINT) AS adc_micro FROM routed) r) s
       |  WHERE srn <= $topR),
       |scored AS (
       |  SELECT s.probe_id, e.vec_id, ${nullCos("e.e", "pv.pe")} AS rawcos
       |  FROM surv s JOIN emb e ON e.vec_id = s.vec_id
       |  JOIN pv ON pv.probe_id = s.probe_id),
       |rk AS (
       |  SELECT probe_id, vec_id, rawcos,
       |    CAST(row_number() OVER (PARTITION BY probe_id
       |      ORDER BY rawcos DESC, vec_id) AS INTEGER) AS rn
       |  FROM scored)
       |SELECT probe_id, vec_id, round(rawcos, 6) AS cos, rn
       |FROM rk WHERE rn <= $kNn ORDER BY probe_id, rn""".stripMargin
  }

  /** Oracle for `retrieval_ivfpq_recall` (r17): the recall_at_k
    * composition over [[ivfPqSql]] vs the exact cosine top-k. */
  def ivfPqRecallSql(centers: Seq[Seq[Double]],
                     cb: graft.operators.VectorOps.PqCodebook,
                     lut: IndexedSeq[Seq[Double]], nprobe: Int = 4,
                     kNn: Int = 10, topR: Int = 50): String = {
    val two = ivfPqSql(centers, cb, lut, nprobe, kNn, topR)
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |pv AS (SELECT e AS pe FROM emb WHERE vec_id = 0),
       |exact AS (
       |  SELECT e.vec_id FROM emb e, pv
       |  ORDER BY ${nullCos("e.e", "pv.pe")} DESC, e.vec_id LIMIT $kNn),
       |two AS (SELECT vec_id FROM ($two) t)
       |SELECT COUNT(*) AS n_exact, COUNT(t.vec_id) AS n_hit,
       |  COUNT(t.vec_id) * 1000000 // COUNT(*) AS recall_micro
       |FROM exact e LEFT JOIN two t USING (vec_id)
       |ORDER BY n_exact""".stripMargin
  }

  // ---- simhash oracles ------------------------------------------------
  // The simhash token hash is a codepoint polynomial mod 2³¹−1 expanded
  // to 64 bits by four pinned multiplicative mixers
  // (ShingleKernels.simHash64 — designed so this SQL can exist). `ths`
  // below is the per-document list of token polynomial hashes; each
  // fingerprint bit is an independent ±1 vote sum over that list.

  /** Per-document token-hash list over `lower(text)` — tracks
    * ShingleKernels.simHash64's tokenization (split on single spaces,
    * empty tokens dropped) and polynomial (a₀=7, ×31 mod 2147483647 over
    * codepoints). */
  private val tokenHashes: String =
    """list_transform(
      |    list_filter(string_split(lower(text), ' '), x -> x <> ''),
      |    wd -> list_reduce(list_prepend(CAST(7 AS BIGINT),
      |            list_transform(string_split_regex(wd, ''), c -> CAST(ord(c) AS BIGINT))),
      |          (a, c) -> (a * 31 + c) % 2147483647))""".stripMargin

  /** The signed-64-bit fingerprint from a token-hash list column `ths`:
    * bit b set iff the vote sum over tokens of (bit (b mod 16) of
    * (hash · mixer(b div 16)) mod P) is positive. Bit 63 contributes
    * −2⁶³ (two's complement) so the BIGINT equals Spark's Long exactly. */
  private def fingerprintSql(ths: String): String =
    (0 until 64).map { b =>
      val m = graft.functions.ShingleKernels.SimMixers(b / 16)
      val pow = 1L << (b % 16)
      val vote = s"list_sum(list_transform($ths, a -> " +
        s"CASE WHEN (((((a * a) % 2147483647) * $m) % 2147483647 // $pow) % 2) = 1 " +
        "THEN 1 ELSE -1 END))"
      val bitVal = if (b == 63) "-9223372036854775808" else (1L << b).toString
      s"(CASE WHEN $vote > 0 THEN CAST($bitVal AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", "\n  + ", ")")

  // ---- minhash oracles ------------------------------------------------
  // The shingle hash is two packed codepoint polynomials (ShingleKernels
  // .shingleHashes), the minhash lanes are affine mixes mod P with the
  // SAME pinned (a_i, b_i) constants (ShingleExpressions.mixParams), and
  // the band key is a polynomial fold of the lanes — every stage is plain
  // integer arithmetic both engines compute bit-identically.

  /** Packed 62-bit shingle hash of a string expression `s`:
    * poly(7, 31)·2³¹ + poly(11, 131), each mod 2³¹−1 over codepoints. */
  private def shingleHashSql(s: String): String = {
    def poly(init: Int, mult: Int) =
      s"list_reduce(list_prepend(CAST($init AS BIGINT), " +
        s"list_transform(string_split_regex($s, ''), c -> CAST(ord(c) AS BIGINT))), " +
        s"(a, c) -> (a * $mult + c) % 2147483647)"
    s"(${poly(7, 31)} * 2147483648 + ${poly(11, 131)})"
  }

  /** Shared CTE prefix for the minhash oracles: tokenized docs → distinct
    * packed shingle hashes → 32 minhash lanes → 8 banded fold keys →
    * verified candidate pairs (tracks DedupOps.nearMinhash defaults:
    * k = 3, nHashes = 32, rowsPerBand = 4, τ = 0.7). */
  private def nearMinhashCtes(nHashes: Int, rowsPerBand: Int,
                              tau: Double): String = {
    val (as, bs) = graft.functions.ShingleExpressions.mixParams(nHashes)
    val nBands = nHashes / rowsPerBand
    val lanes = (0 until nHashes).map { i =>
      s"list_min(list_transform(sh, h -> ((h % 2147483647) * ${as(i)} + ${bs(i)}) % 2147483647)) AS s_$i"
    }.mkString(",\n    ")
    def bandKey(b: Int): String =
      (0 until rowsPerBand).foldLeft("CAST(17 AS BIGINT)") { (acc, j) =>
        s"(($acc * 1009 + s_${b * rowsPerBand + j}) % 2147483647)"
      }
    val bands = (0 until nBands).map(b => s"${bandKey(b)} AS bk_$b")
      .mkString(",\n    ")
    val anyBand = (0 until nBands).map(b => s"a.bk_$b = b.bk_$b").mkString(" OR ")
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
       |    i -> ${shingleHashSql("(w[i] || ' ' || w[i+1] || ' ' || w[i+2])")})) AS sh
       |  FROM toks WHERE len(w) >= 3),
       |sig AS (
       |  SELECT doc_id, sh,
       |    $lanes
       |  FROM sh),
       |bands AS (
       |  SELECT doc_id, sh,
       |    $bands
       |  FROM sig),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.doc_id < b.doc_id AND ($anyBand)),
       |pairs AS (
       |  SELECT c.id_a, c.id_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
       |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jac
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.id_a
       |  JOIN sh sb ON sb.doc_id = c.id_b)""".stripMargin
  }

  /** Oracle for `dedup_near_minhash` — exact verified pairs + jaccard. */
  def nearMinhashSql(nHashes: Int = 32, rowsPerBand: Int = 4,
                     tau: Double = 0.7): String =
    s"""WITH ${nearMinhashCtes(nHashes, rowsPerBand, tau)}
       |SELECT id_a, id_b, round(jac, 6) AS jaccard
       |FROM pairs WHERE jac >= $tau ORDER BY id_a, id_b""".stripMargin

  /** Oracle for `dedup_minhash_calibration` — per matching-lane count
    * over the pre-τ candidate pairs: pair count, the estimator's
    * implied similarity, and the mean EXACT shingle Jaccard, all in
    * integer micro (// ≡ Spark DIV). */
  def minhashCalibrationSql(nHashes: Int = 32,
                            rowsPerBand: Int = 4): String = {
    val laneMatch = (0 until nHashes)
      .map(i => s"(CASE WHEN sa.s_$i = sb.s_$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH ${nearMinhashCtes(nHashes, rowsPerBand, 0.0)},
       |m AS (
       |  SELECT
       |    ($laneMatch) AS lane_matches,
       |    CAST((CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) * 1000000)
       |      // (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |      AS BIGINT) AS jac_micro
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b)
       |SELECT CAST(lane_matches AS INTEGER) AS lane_matches,
       |  COUNT(*) AS n_pairs,
       |  CAST((CAST(lane_matches AS BIGINT) * 1000000) // $nHashes AS BIGINT)
       |    AS est_micro,
       |  CAST(SUM(jac_micro) // COUNT(*) AS BIGINT) AS mean_true_micro
       |FROM m GROUP BY lane_matches ORDER BY lane_matches""".stripMargin
  }

  /** Oracle for `dedup_minhash_clusters` — transitive closure over the
    * verified minhash pairs (same recursive-CTE shape as
    * dedup_jaccard_clusters' oracle). */
  def minhashClustersSql(nHashes: Int = 32, rowsPerBand: Int = 4,
                         tau: Double = 0.7): String =
    s"""WITH RECURSIVE ${nearMinhashCtes(nHashes, rowsPerBand, tau)},
       |vpairs AS (SELECT id_a, id_b FROM pairs WHERE jac >= $tau),
       |edges AS (
       |  SELECT id_a AS a, id_b AS b FROM vpairs
       |  UNION SELECT id_b, id_a FROM vpairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
       |)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** Oracle for `corpus_dup_hist` — the minhash-clusters closure wrapped
    * in a size histogram, with unclustered documents accounted as size-1
    * singletons (n_docs must sum to the corpus size). DuckDB integer
    * SUMs are HUGEINT, hence the BIGINT casts on the aggregated
    * columns. */
  def clusterSizeHistSql(nHashes: Int = 32, rowsPerBand: Int = 4,
                         tau: Double = 0.7): String =
    s"""WITH cl AS (SELECT * FROM (
       |${minhashClustersSql(nHashes, rowsPerBand, tau)}
       |) x),
       |hist AS (
       |  SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
       |  FROM (SELECT cluster, COUNT(*) AS cluster_size FROM cl GROUP BY cluster) s
       |  GROUP BY cluster_size),
       |singles AS (
       |  SELECT CAST(1 AS BIGINT) AS cluster_size,
       |    (SELECT COUNT(*) FROM documents) - (SELECT COUNT(*) FROM cl) AS n_clusters),
       |u AS (SELECT * FROM hist
       |      UNION ALL SELECT * FROM singles WHERE n_clusters > 0)
       |SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters,
       |  CAST(cluster_size * SUM(n_clusters) AS BIGINT) AS n_docs
       |FROM u GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  /** Oracle for `dedup_simhash` — exact fingerprint equality. */
  def simhashSql(): String =
    s"""WITH th AS (SELECT doc_id, $tokenHashes AS ths FROM documents)
       |SELECT doc_id, ${fingerprintSql("ths")} AS simhash
       |FROM th ORDER BY doc_id""".stripMargin

  /** Oracle for `dedup_simhash_pairs` (4 bands × 16 bits, maxHamming 8 —
    * must track DedupOps.simhashPairs defaults). Banding works on the
    * UNSIGNED view of the fingerprint (HUGEINT + 2⁶⁴ when negative),
    * matching Spark's `shiftrightunsigned`. */
  def simhashPairsSql(bands: Int = 4, maxHamming: Int = 8): String = {
    val bandBits = 64 / bands
    val width = 1L << bandBits
    s"""WITH th AS (SELECT doc_id, $tokenHashes AS ths FROM documents),
       |fp AS (SELECT doc_id, ${fingerprintSql("ths")} AS fp FROM th),
       |ufp AS (SELECT doc_id, fp,
       |  CAST(fp AS HUGEINT) + CASE WHEN fp < 0
       |    THEN CAST(18446744073709551616 AS HUGEINT) ELSE 0 END AS u FROM fp),
       |banded AS (
       |  SELECT doc_id, fp, band,
       |    CAST((u // CAST(POWER($width, band) AS HUGEINT)) % $width AS BIGINT) AS slice
       |  FROM ufp CROSS JOIN
       |    (SELECT UNNEST(${(0 until bands).mkString("[", ",", "]")}) AS band) bs),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.fp AS fa, b.fp AS fb
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(fa, fb)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- BPE trainer/apply oracles (r11 verdict #5) -------------------
  //
  // The iterative BPE loop unrolls into plain SQL because each
  // iteration's work is closed-form once you pick the right word
  // ENCODING: a word's symbol sequence is a chr(31)-joined string, and
  // a leftmost-non-overlapping merge of pair (l, r) is EXACTLY SQL
  // `replace()` over the double-delimited rendering
  // chr(31)·sym·chr(30) per symbol — replace scans left to right over
  // non-overlapping matches, which IS the BPE merge rule, and the
  // two-sided delimiters make partial-symbol (suffix/prefix) matches
  // impossible while keeping each replacement's boundaries intact for
  // the next adjacent match ("aaaa" → aa·aa, "aaa" → aa·a). Unlike
  // baking Spark's learned merges in as literals, each iteration's
  // winning pair is COMPUTED IN SQL (argmax with the same
  // count-desc/(l,r)-lexicographic tie-break), so the oracle is a
  // genuinely independent replay of the trainer, not a mirror.

  /** Shared CTE chain: wordfreq → words0 → (p_k, top_k, words_k) per
    * unrolled iteration. `words{merges}` holds each vocab word's final
    * tokenization; `top_k` holds iteration k's winning merge. When the
    * vocabulary exhausts mergeable pairs before `merges` iterations,
    * `top_k` is empty and the iteration is a NO-OP (LEFT JOIN ON TRUE +
    * CASE fallback to the previous encoding), matching the Spark
    * trainer's early stop — a CROSS JOIN here would silently empty every
    * downstream CTE instead (r12 ADVICE). */
  private def bpeChainSql(merges: Int): String = {
    def iterSql(k: Int): String =
      s"""p$k AS (
         |  SELECT ls[i] AS l, ls[i+1] AS r, SUM(freq) AS cnt FROM (
         |    SELECT freq, ls, unnest(range(1, len(ls))) AS i
         |    FROM (SELECT freq, string_split(w, chr(31)) AS ls FROM words${k - 1})) t
         |  GROUP BY 1, 2),
         |top$k AS (SELECT l, r, l || r AS m, cnt FROM p$k
         |          ORDER BY cnt DESC, l, r LIMIT 1),
         |words$k AS (
         |  SELECT word, freq,
         |    CASE WHEN l IS NULL THEN wprev$k ELSE
         |      replace(substr(rep$k, 2, length(rep$k) - 2),
         |              chr(30) || chr(31), chr(31)) END AS w
         |  FROM (
         |    SELECT word, freq, w AS wprev$k, l,
         |      replace(chr(31) || replace(w, chr(31), chr(30) || chr(31)) || chr(30),
         |              chr(31) || l || chr(30) || chr(31) || r || chr(30),
         |              chr(31) || m || chr(30)) AS rep$k
         |    FROM words${k - 1} LEFT JOIN top$k ON TRUE))""".stripMargin
    s"""WITH wordfreq AS (
       |  SELECT word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) AS word
       |    FROM documents) t
       |  WHERE word <> '' GROUP BY word),
       |words0 AS (
       |  SELECT word, freq,
       |    array_to_string(
       |      list_filter(string_split_regex(word, ''), x -> x <> ''),
       |      chr(31)) AS w
       |  FROM wordfreq),
       |${(1 to merges).map(iterSql).mkString(",\n")}""".stripMargin
  }

  /** Oracle for `pipeline_bpe_merges` (must track CorpusOps.bpeMerges'
    * default merges = 5). */
  def bpeMergesSql(merges: Int = 5): String = {
    val rows = (1 to merges)
      .map(k => s"""SELECT $k AS iter, l AS "left", r AS "right",
                   |    m AS merged, CAST(cnt AS BIGINT) AS pair_freq
                   |  FROM top$k""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""${bpeChainSql(merges)},
       |sel AS (
       |  $rows)
       |SELECT iter, "left", "right", merged, pair_freq FROM sel
       |ORDER BY iter""".stripMargin
  }

  /** Oracle for `pipeline_bpe_apply` (must track CorpusOps.bpeApply's
    * default merges = 5): re-join the trained vocab tokenizations to
    * the corpus in word-position order — same ' ' intra-word / ' | '
    * inter-word md5 stream as the Spark side, zero-word docs md5(''). */
  def bpeApplySql(merges: Int = 5): String =
    s"""${bpeChainSql(merges)},
       |tok AS (SELECT word, replace(w, chr(31), ' ') AS s,
       |        len(string_split(w, chr(31))) AS n FROM words$merges),
       |docw AS (
       |  SELECT doc_id, unnest(ls) AS word, unnest(range(1, len(ls) + 1)) AS pos
       |  FROM (SELECT doc_id,
       |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS ls
       |        FROM documents)),
       |j AS (SELECT d.doc_id, d.pos, t.s, t.n
       |      FROM docw d JOIN tok t USING (word))
       |SELECT doc.doc_id,
       |  COUNT(j.s) AS n_words,
       |  CAST(COALESCE(SUM(j.n), 0) AS BIGINT) AS n_tokens,
       |  md5(COALESCE(string_agg(j.s, ' | ' ORDER BY j.pos), '')) AS tokens_md5
       |FROM documents doc LEFT JOIN j ON doc.doc_id = j.doc_id
       |GROUP BY doc.doc_id ORDER BY doc.doc_id""".stripMargin
}
