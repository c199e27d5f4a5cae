package graft.operators

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-5 additions: word-entropy, html strip, deterministic output
  * sharding, nearest as-of, int8 quantization, and the pointer-jumping
  * connected-components upgrade. Each operator is also DuckDB-oracled
  * through the gate (except clusters, whose oracle rides
  * dedup_jaccard_clusters); these tests pin the semantics the oracle
  * can't see — edge cases, invariants, and the >50-diameter component
  * that the pre-jump label propagation would have silently mislabeled.
  */
class RoundFiveOpsSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("source", concat(lit("src"), col("doc_id")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))

  test("text_entropy: uniform distribution hits log2(k), repetition hits 0") {
    val out = TextOps.entropy(docs(
        1L -> "a b c d",    // 4 distinct, uniform -> 2 bits, ttr 1
        2L -> "a a a a",    // degenerate -> 0 bits, ttr 0.25
        3L -> "a a b b"))   // 2 distinct, uniform -> 1 bit
      .orderBy("doc_id")
      .select("n_words", "n_distinct", "entropy_bits", "ttr")
      .collect()
    assert(out(0).getDouble(2) === 2.0 && out(0).getDouble(3) === 1.0)
    assert(out(1).getDouble(2) === 0.0 && out(1).getDouble(3) === 0.25)
    assert(out(2).getDouble(2) === 1.0 && out(2).getDouble(3) === 0.5)
    assert(out.forall(r => r.getLong(0) === 4L))
  }

  test("text_html_strip: recovers source + text; tags, scripts, comments gone") {
    val out = TextOps.htmlStrip(docs(
        1L -> "plain words only",
        2L -> "entity &lt;tag&gt; stays &amp; unescapes"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "src1 plain words only")
    // planted entities in the TEXT survive the strip as decoded chars
    assert(out(1).getString(1) === "src2 entity <tag> stays & unescapes")
    assert(out.forall(r => !r.getString(1).contains("<script>")))
    assert(out.forall(r => r.getInt(2) === r.getString(1).length))
  }

  test("pipeline_shard_output: partition of the corpus, deterministic manifest") {
    val input = Tables.documents(spark, sf())
    val m1 = CorpusOps.shardOutput(input, nShards = 8, rankPartitions = 4).collect()
    val m2 = CorpusOps.shardOutput(input, nShards = 8, rankPartitions = 4).collect()
    assert(m1.toSeq === m2.toSeq, "manifest must be run-to-run identical")
    assert(m1.map(_.getLong(1)).sum === input.count(), "shards must partition the corpus")
    assert(m1.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 8))
    // a different shard count reshuffles membership but still partitions
    val m3 = CorpusOps.shardOutput(input, nShards = 3, rankPartitions = 4).collect()
    assert(m3.map(_.getLong(1)).sum === input.count())
    assert(m3.map(_.getInt(0)).toSet === Set(0, 1, 2))
  }

  test("join_asof_nearest: closer side wins, ties prefer earlier, nulls stay null") {
    def ts(s: String) = Timestamp.valueOf(s)
    val t10 = ts("2024-01-01 10:00:00"); val t20 = ts("2024-01-01 20:00:00")
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100L), // before both -> 10:00
      (1L, ts("2024-01-01 14:00:00"), 101L), // 4h vs 6h -> 10:00
      (1L, ts("2024-01-01 16:00:00"), 102L), // 6h vs 4h -> 20:00
      (1L, ts("2024-01-01 15:00:00"), 103L), // 5h tie -> earlier 10:00
      (1L, t20, 104L),                       // exact hit -> 20:00
      (2L, ts("2024-01-01 12:00:00"), 105L)  // no orders for user 2 -> null
    ).toDF("user_id", "ts", "event_id")
      .union(Seq((1L, null.asInstanceOf[Timestamp], 106L))
        .toDF("user_id", "ts", "event_id"))
    val orders = Seq((1L, t10, 900L), (1L, t20, 901L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val got = Joins.asofNearest(events, orders)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val e10 = t10.getTime / 1000; val e20 = t20.getTime / 1000
    assert(got === Map(100L -> e10, 101L -> e10, 102L -> e20, 103L -> e10,
      104L -> e20, 105L -> -1L, 106L -> -1L))
  }

  test("vec_quantize_int8: codes match HALF_UP reference, zero vector is clean") {
    val vecs = Seq(
      (1L, Seq(0.0f, -4.0f, 1.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = VectorOps.quantizeInt8(vecs).orderBy("vec_id").collect()
    // reference codes via the same double math + HALF_UP rounding
    val scale = 4.0 / 127.0
    val codes = Seq(0.0, -4.0, 1.0).map(v =>
      BigDecimal(v / scale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    assert(out(0).getLong(3) === codes.sum)
    assert(out(0).getLong(4) === codes.map(math.abs).sum)
    assert(out(0).getLong(5) === codes.max)
    assert(out(1).getDouble(2) === 0.0 && out(1).getLong(3) === 0L &&
      out(1).getLong(4) === 0L && out(1).getLong(5) === 0L)
    // corpus-wide invariant: every code bounded by int8 range
    val corpus = VectorOps.quantizeInt8(Tables.embeddings(spark, sf()))
    assert(corpus.filter(col("code_max") > 127 ||
      col("code_abs_sum") > col("n_dims").cast("long") * 127L).isEmpty)
  }

  test("clusters: 200-node path collapses to one component inside the round cap") {
    // diameter 199 >> the 50-round cap: plain one-hop label propagation
    // CANNOT finish this; the pointer-jump step contracts it in O(log n)
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DedupOps.clusters(pairs).collect()
    assert(labels.length === 200)
    assert(labels.forall(_.getLong(1) === 0L), "all labels must reach the min id")
  }

  test("text_ngram_novelty: shared trigrams score 0, original text scores 1") {
    val out = CorpusOps.ngramNovelty(docs(
        1L -> "the quick brown fox jumps",   // shares "the quick brown" + "quick brown fox" with doc 2
        2L -> "the quick brown fox sleeps",
        3L -> "entirely original words here now"))
      .orderBy("doc_id").collect()
    // doc 1: grams {t q b, q b f, b f j} — first two shared with doc 2
    assert(out(0).getLong(1) === 3L && out(0).getLong(2) === 1L)
    assert(out(1).getLong(1) === 3L && out(1).getLong(2) === 1L)
    assert(out(2).getDouble(3) === 1.0, "isolated doc must be fully novel")
  }

  test("text_zipf: an exactly-Zipfian corpus fits slope ≈ -1") {
    // word i repeated ~64/i times -> ln(freq) = ln 64 - ln(rank)
    val text = (1 to 8).flatMap(i => Seq.fill(64 / i)(s"w$i")).mkString(" ")
    val out = CorpusOps.zipfFit(docs(1L -> text), topN = 8).collect()(0)
    assert(out.getInt(0) === 8)
    val slope = out.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"slope $slope")
    assert(out.getDouble(2) > 0, "intercept must be positive (ln of top freq)")
  }

  test("sample_pps: docs at/above the char budget always kept with weight 1") {
    val long = docs(1L -> ("x" * 2500), 2L -> ("y" * 2000))
    val kept = CorpusOps.samplePps(long, charBudget = 2000).collect()
    assert(kept.length === 2)
    assert(kept.forall(_.getDouble(2) === 1.0))
    // determinism + keep-rate sanity on the real corpus: identical reruns,
    // and short docs are kept at roughly n_chars/budget
    val corpus = Tables.documents(spark, sf())
    val a = CorpusOps.samplePps(corpus).collect()
    val b = CorpusOps.samplePps(corpus).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length > 0 && a.length <= corpus.count())
  }

  test("dedup_embedding_clusters: planted duplicate vectors cluster together") {
    val base = (0 until 64).map(i => math.sin(i * 0.7).toFloat)
    val other = (0 until 64).map(i => math.cos(i * 1.3).toFloat)
    def jitter(v: Seq[Float], eps: Float) = v.map(_ + eps)
    val vecs = Seq(
      (1L, base), (2L, jitter(base, 1e-4f)), (3L, jitter(base, 2e-4f)),
      (10L, other), (11L, jitter(other, 1e-4f)),
      (20L, (0 until 64).map(i => ((i * 37 % 13) - 6).toFloat)) // unrelated
    ).toDF("vec_id", "embedding")
    val pairs = VectorOps.nearDupEmbedding(vecs, nBands = 4, bitsPerBand = 6)
    val got = DedupOps.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.getOrElse(2L, -1L) === 1L && got.getOrElse(3L, -1L) === 1L)
    assert(got.getOrElse(11L, -1L) === 10L)
    assert(!got.contains(20L), "unrelated vector must not join any cluster")
  }

  test("clusters: adversarial shapes — star, H-merge, disjoint components") {
    // star: hub 0 with 50 leaves (diameter 2, the common near-dup shape)
    val star = (1L to 50L).map(i => (0L, i)).toDF("id_a", "id_b")
    assert(DedupOps.clusters(star).collect().forall(_.getLong(1) === 0L))
    // H-merge: two long chains (0.. and 1000..) bridged mid-chain — the
    // min label must cross the bridge and win the whole second chain
    val chainA = (0L until 60L).map(i => (i, i + 1))
    val chainB = (1000L until 1060L).map(i => (i, i + 1))
    val bridge = Seq((30L, 1030L))
    val h = (chainA ++ chainB ++ bridge).toDF("id_a", "id_b")
    assert(DedupOps.clusters(h).collect().forall(_.getLong(1) === 0L))
    // disjoint components keep distinct minima
    val two = (Seq((1L, 2L), (2L, 3L)) ++ Seq((10L, 11L))).toDF("id_a", "id_b")
    val got = DedupOps.clusters(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }
}
