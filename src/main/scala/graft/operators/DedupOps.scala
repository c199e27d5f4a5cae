package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ShingleExpressions

/** Deduplication operators over `documents` (LLM-data-pipeline extensions).
  *
  * Scale design: every variant reduces to (a) a deterministic per-row
  * signature computed map-side with no shuffle, then (b) ONE shuffle on the
  * signature/bucket key. Nothing here collects to the driver; nothing is
  * quadratic in corpus size (candidate generation is bucket-local).
  */
object DedupOps {

  /** `dedup_exact`: exact dedup on text, keeping the lowest doc_id.
    * `row_number` over a hash-partitioned window — deterministic keeper,
    * unlike `dropDuplicates` (which keeps an arbitrary first-seen row and
    * is therefore partitioning-dependent). At 100 TB, partition by
    * `xxhash64(text)` instead of raw text to keep shuffle keys small. */
  def exact(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy("text").orderBy("doc_id")
    documents
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** `dedup_near_minhash`: near-duplicate clustering via shingling →
    * MinHash → banded LSH. Signature: `nHashes` minhashes over word
    * 3-shingles; bands of `rowsPerBand` hashes are hashed to a band key;
    * docs sharing any band key become candidate pairs; candidates are
    * verified with exact shingle-set Jaccard.
    *
    * Pipeline = map (signatures) → explode bands → shuffle on band key →
    * bucket-local pairs → verify. The only shuffle key is (band, bandHash);
    * skewed mega-buckets (boilerplate docs) would be salted at scale.
    * No oracle (LSH is sampling-based); ScalaTest asserts the known
    * near-dup pairs are found. */
  def nearMinhash(documents: DataFrame, shingleK: Int = 3, nHashes: Int = 32,
                  rowsPerBand: Int = 4, jaccardTau: Double = 0.7): DataFrame = {
    val nBands = nHashes / rowsPerBand
    // compiled custom expressions (graft.functions.ShingleExpressions):
    // the pure-HOF formulation is interpreted per element and profiled
    // ~10s at sf0.1; one compiled pass per row is ~100× cheaper
    val sh = documents
      .select(col("doc_id"),
        ShingleExpressions.shingleHashes(lower(col("text")), shingleK).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.select(
      col("doc_id"),
      ShingleExpressions.minHashSignature(col("sh"), nHashes).as("sig"))
    // banded rows carry ONLY (band-key, doc_id): the candidate self-join
    // shuffles two longs per row, never the shingle arrays
    val banded = sig.select(
      col("doc_id"),
      explode(
        array((0 until nBands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
              .as("bh"))): _*)).as("bk"))
    val cand = banded.select(col("bk"), col("doc_id").as("id_a"))
      .join(banded.select(col("bk"), col("doc_id").as("id_b")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verification re-attaches the (small, broadcastable) shingle sets
    cand
      .join(broadcast(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))), "id_a")
      .join(broadcast(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= jaccardTau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** `dedup_simhash`: 64-bit SimHash fingerprints. Each token votes its
    * hash bits weighted ±1; the sign vector packs into one long. Docs with
    * identical simhash (or small Hamming distance via band-rotation at
    * scale) are near-dups. Pure column arithmetic, no shuffle until the
    * final self-join on the fingerprint. */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = filter(split(lower(col("text")), " "), t => t =!= "")
    val hashes = transform(toks, t => xxhash64(t))
    val bitCols = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    documents
      .select(col("doc_id"), bitCols.reduce(_ + _).as("simhash"))
      .orderBy("doc_id")
  }

  /** `dedup_ngram_jaccard`: exact n-gram Jaccard similarity for all pairs
    * sharing at least one shingle — the inverted-index formulation:
    * explode shingles → self-join on shingle → per-pair intersection count
    * → |A∪B| = |A|+|B|−|A∩B|. One shuffle on the shingle key; never a
    * crossJoin. Hot shingles (stopword runs) are the skew risk at scale —
    * cap or salt them. */
  /** `maxDf` is the skew knob for boilerplate-heavy corpora: shingles
    * held by more than maxDf documents are dropped from candidate
    * generation (lossy — pairs that ONLY share ultra-common shingles are
    * missed, which is usually the point). Default keeps exact semantics. */
  def ngramJaccard(documents: DataFrame, k: Int = 3, tau: Double = 0.2,
                   maxDf: Int = Int.MaxValue): DataFrame = {
    // 64-bit-hashed shingles: the self-join shuffles longs, not strings.
    // Collisions would need ~2^32 distinct shingles to matter (corpus has
    // ~10^5); result is semantically identical to joining raw shingles.
    val sh = documents
      .select(col("doc_id"),
        explode(ShingleExpressions.shingleHashes(lower(col("text")), k)).as("sh"))
    // |shingles(doc)| computed map-side from the array length — no
    // explode + groupBy shuffle just to count
    val sizes = documents.select(col("doc_id"),
      size(ShingleExpressions.shingleHashes(lower(col("text")), k)).cast("long").as("n"))
    // inverted index in ONE shuffle: doc list per shingle; singleton
    // shingles (df=1) can't produce pairs — dropped exactly. Pairs come
    // from a double explode of the (≤ df_max) doc list, so there is no
    // self-join and no second shuffle of the shingle table.
    val byShingle = sh.groupBy("sh")
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxDf)
    val pairs = byShingle
      .select(explode(col("ds")).as("id_a"), col("ds"))
      .select(col("id_a"), explode(col("ds")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(broadcast(sizes.select(col("doc_id").as("id_a"), col("n").as("n_a"))), "id_a")
      .join(broadcast(sizes.select(col("doc_id").as("id_b"), col("n").as("n_b"))), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }
}
