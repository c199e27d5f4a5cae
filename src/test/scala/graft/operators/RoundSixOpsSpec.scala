package graft.operators

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Round-6 second-wave additions: hourly anomaly detection, per-source
  * quota capping, n-gram containment (the subset-duplicate detector),
  * the duplicate-cluster size histogram, and windowed co-occurrence
  * PMI. Each is DuckDB-oracled through the gate; these tests pin the
  * semantics the oracle can't see — planted edge cases and the
  * invariants (corpus partition, subset detection, exact z boundary)
  * that make each operator trustworthy on data the gate never shows
  * it.
  */
class RoundSixOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(2))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .withColumn("lang", lit("en"))

  test("ts_anomaly: planted spike flagged; single outlier in 10 hours IS 3σ") {
    // 9 steady hours of 2 events + one hour of 20. A lone outlier among
    // H−1 identical hours sits at exactly √(H−1)·σ/… = z = 3 for H = 10
    // REGARDLESS of spike height — so the default k=3 (strict >) must
    // stay quiet, and k=2 must flag exactly the spike. This pins both
    // the strict inequality and the exact integer z algebra at once.
    val steady = (0 until 9).flatMap(h => Seq(
      (h * 2L, 1L, ts(f"2024-01-01 0$h:00:10"), "click", 1.0),
      (h * 2L + 1, 1L, ts(f"2024-01-01 0$h:30:10"), "click", 1.0)))
    val spike = (0 until 20).map(i =>
      (100L + i, 1L, ts(f"2024-01-01 09:${i + 10}%02d:00"), "click", 1.0))
    val events = (steady ++ spike)
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(StreamBatchOps.anomaly(events, k = 3).count() === 0,
      "a lone outlier among 10 hours is exactly 3σ — strict > must not flag it")
    val out = StreamBatchOps.anomaly(events, k = 2).collect()
    assert(out.length === 1)
    assert(out(0).getString(0) === "click")
    assert(out(0).getLong(2) === 20L)
  }

  test("ts_anomaly: exact z boundary is strict (> k·σ, not ≥)") {
    // two hours, counts 1 and 3: μ=2, σ=1 ⇒ |z|=1 for both hours.
    // k=1 must flag nothing (strict), k=0 must flag both.
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:00:10"), "e", 1.0),
      (2L, 1L, ts("2024-01-01 01:00:10"), "e", 1.0),
      (3L, 1L, ts("2024-01-01 01:10:10"), "e", 1.0),
      (4L, 1L, ts("2024-01-01 01:20:10"), "e", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(StreamBatchOps.anomaly(events, k = 1).count() === 0)
    assert(StreamBatchOps.anomaly(events, k = 0).count() === 2)
  }

  test("pipeline_quota_cap: caps over-quota sources, under-quota pass through") {
    // src0: 4 docs (over a quota of 2) — keep the 2 longest;
    // src1: 2 docs (at quota) — untouched
    val d = docs(
      2L -> "aa", 4L -> "aaaa aaaa", 6L -> "aaaa", 8L -> "aaaa aaaa aaaa",
      1L -> "bb", 3L -> "bb bb")
    val out = CorpusOps.quotaCap(d, quota = 2).collect()
    assert(out.map(_.getLong(0)).toSet === Set(4L, 8L, 1L, 3L))
    // ties on n_chars break by doc_id: two equal-length docs keep the lower id
    val tied = docs(10L -> "xx", 12L -> "xx", 14L -> "xx")
    assert(CorpusOps.quotaCap(tied, quota = 2).collect().map(_.getLong(0)).toSet
      === Set(10L, 12L))
  }

  test("corpus_dup_hist: n_docs partitions the corpus; planted cluster counted") {
    val base = Tables.documents(spark, sf())
    val out = DedupOps.clusterSizeHist(base).collect()
    assert(out.map(_.getLong(2)).sum === base.count(),
      "histogram n_docs must sum to the corpus size")
    assert(out.forall(r => r.getLong(2) === r.getLong(0) * r.getLong(1)))
    // a planted triple of identical docs forms one size-3 cluster
    val planted = base.unionByName(docs(
      900001L -> "planted duplicate text repeated verbatim across three documents exactly",
      900002L -> "planted duplicate text repeated verbatim across three documents exactly",
      900003L -> "planted duplicate text repeated verbatim across three documents exactly")
      .select(base.columns.map(col): _*))
    val h = DedupOps.clusterSizeHist(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h.getOrElse(3L, 0L) >= 1L, s"expected a size-3 cluster in $h")
  }

  test("dedup_ngram_containment: finds the subset-dup jaccard misses") {
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> short, 2L -> long)
    val cont = DedupOps.ngramContainment(d, tau = 0.9).collect()
    assert(cont.length === 1 &&
      cont(0).getLong(0) === 1L && cont(0).getLong(1) === 2L &&
      cont(0).getDouble(2) === 1.0,
      "short doc fully contained in long doc must score containment 1.0")
    // the SAME pair scores far below a 0.2 jaccard threshold — the
    // motivating asymmetry (3/41 shared-over-union ≈ 0.07)
    assert(DedupOps.ngramJaccard(d, tau = 0.2).count() === 0)
  }

  test("text_cooccur_pmi: counts and pmi on a hand-checked corpus") {
    // "a b" adjacent twice and once at distance 2 (via "a c b") = cnt 3
    val d = docs(1L -> "a b a b", 2L -> "a c b")
    val out = CorpusOps.cooccurPmi(d, win = 2, topN = 10).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // doc1 [a b a b] pairs (win=2): ab, aa, ab, bb, ab → a-b:3, a-a:1, b-b:1
    // doc2 [a c b] pairs: ac, ab, bc → a-b:1, a-c:1, b-c:1
    assert(byPair(("a", "b")) === 4L)
    assert(byPair(("a", "a")) === 1L && byPair(("b", "c")) === 1L)
    assert(out.map(_.getLong(2)).sum === 8L, "total co-occurrence events")
    // pmi("a","b") = ln(4·8 / (3·3)) — word counts: a×3, b×3, T=8
    val pmiAb = out.find(r => r.getString(0) == "a" && r.getString(1) == "b").get.getDouble(3)
    assert(math.abs(pmiAb - math.log(32.0 / 9.0)) < 1e-5)
  }
}
