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
    // NULL source is a partition like any other (round-7 ADVICE fix):
    // the equi-key split used to route NULL rows around the cap via the
    // anti-join path; the null-safe keys cap them like the oracle's window
    val withNull = docs(
      2L -> "aa", 4L -> "aaaa aaaa", 6L -> "aaaa", 8L -> "aaaa aaaa aaaa")
      .withColumn("source", lit(null).cast("string"))
    val cappedNull = CorpusOps.quotaCap(withNull, quota = 2).collect()
    assert(cappedNull.map(_.getLong(0)).toSet === Set(4L, 8L),
      "an over-quota NULL source must be capped, not bypassed")
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

  test("ts_seasonality: hour-of-day shares sum to 1 and match planted profile") {
    // type "e": 3 events at clock hour 0 (across days), 1 at hour 12
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:10:00"), "e", 1.0),
      (2L, 1L, ts("2024-01-02 00:20:00"), "e", 1.0),
      (3L, 1L, ts("2024-01-03 00:30:00"), "e", 1.0),
      (4L, 1L, ts("2024-01-01 12:00:00"), "e", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = StreamBatchOps.seasonality(events).collect()
    assert(out.length === 2)
    assert(out(0).getInt(1) === 0 && out(0).getLong(2) === 3L
      && out(0).getDouble(3) === 0.75)
    assert(out(1).getInt(1) === 12 && out(1).getDouble(3) === 0.25)
  }

  test("ts_changepoint: planted level shift found at the boundary hour") {
    // 4 hours of 2 events then 4 hours of 10: the best split is after
    // hour 4 (means 2 vs 10, shift 8); any other split mixes regimes
    val events = (0 until 4).flatMap(h => (0 until 2).map(i =>
      (h * 10L + i, 1L, ts(f"2024-01-01 0$h:0$i:00"), "e", 1.0))) ++
      (4 until 8).flatMap(h => (0 until 10).map(i =>
        (1000L + h * 10 + i, 1L, ts(f"2024-01-01 0$h:1$i:00"), "e", 1.0)))
    val out = StreamBatchOps.changepoint(
      events.toDF("event_id", "user_id", "ts", "event_type", "value")).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === ts("2024-01-01 03:00:00").getTime / 1000,
      "split hour t is the LAST hour of the before-segment (counts ≤ t)")
    assert(r.getLong(2) === 4L && r.getLong(3) === 4L)
    assert(r.getDouble(4) === 2.0 && r.getDouble(5) === 10.0 && r.getDouble(6) === 8.0)
  }

  test("dedup_phash_images: planted near-copy found, inverted image rejected") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, f(x, y))
      val bos = new ByteArrayOutputStream
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // half-black/half-white; a near-copy with ONE 8×8 corner block
    // flipped (= one phash cell → Hamming 1); a distance-5 variant with
    // FIVE blocks down the left edge flipped (pins the 8-band pigeonhole
    // guarantee for mid-distance pairs — the round-7 ADVICE gap: 4 bands
    // only guaranteed d < 4); the inverse (Hamming 64)
    val half = png((x, _) => if (x < 32) 0x000000 else 0xffffff)
    val near = png((x, y) =>
      if (x < 8 && y < 8) 0xffffff else if (x < 32) 0x000000 else 0xffffff)
    val near5 = png((x, y) =>
      if (x < 8 && y < 40) 0xffffff else if (x < 32) 0x000000 else 0xffffff)
    val inv = png((x, _) => if (x < 32) 0xffffff else 0x000000)
    val media = Seq((1L, half), (2L, near), (3L, inv), (4L, near5))
      .toDF("media_id", "payload")
    val fp1 = MultimodalOps.phash(media).collect().toMap
    val fp2 = MultimodalOps.phash(media).collect().toMap
    assert(fp1 === fp2, "phash must be run-to-run deterministic")
    assert(java.lang.Long.bitCount(fp1(1L) ^ fp1(2L)) === 1)
    assert(java.lang.Long.bitCount(fp1(1L) ^ fp1(4L)) === 5)
    assert(java.lang.Long.bitCount(fp1(1L) ^ fp1(3L)) === 64)
    val pairs = DedupOps.hammingBandPairs(
      MultimodalOps.phash(media).toDF("id", "fp"),
      bands = 8, maxHamming = 6, maxBucket = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every pair within Hamming 6 is found (pigeonhole at 8 bands):
    // (half, near)=1, (half, near5)=5, (near, near5)=4; inv pairs at
    // 59-64 are rejected by the threshold
    assert(pairs.toSeq === Seq((1L, 2L, 1), (1L, 4L, 5), (2L, 4L, 4)))
    // the full query surface runs end to end on the synthetic corpus
    // (hot-bucket cap active — gradient images concentrate buckets)
    MultimodalOps.phashPairs(Tables.documents(spark, sf())).count()
  }

  test("retrieval_hybrid_rrf: fusion formula exact; both-lists docs dominate") {
    val out = RetrievalOps.hybridRrf(
      Tables.documents(spark, sf()), Tables.embeddings(spark, sf())).collect()
    assert(out.nonEmpty && out.length <= 10)
    out.foreach { r =>
      val b = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val d = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(b.nonEmpty || d.nonEmpty, "a fused row must come from some list")
      val expect = b.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        d.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-6,
        s"rrf must be the reciprocal-rank sum: $r")
    }
    // with kEach=20 and rrfK=60, the WORST both-lists score (2/80) beats
    // the BEST single-list score (1/61) — so every doc retrieved by both
    // systems must precede every single-system doc in the fused order
    val bothFlags = out.map(r => !r.isNullAt(1) && !r.isNullAt(2))
    val firstSingle = bothFlags.indexOf(false)
    if (firstSingle >= 0)
      assert(!bothFlags.drop(firstSingle).contains(true),
        "both-lists docs must dominate single-list docs at these parameters")
  }

  test("sample_hardneg: negatives never share the anchor's label; ranked by cos") {
    val emb = Tables.embeddings(spark, sf())
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = VectorOps.hardNegatives(emb).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labelOf(r.getLong(0)) !== r.getInt(2),
        s"hard negative shares the anchor label: $r")
      assert(r.getLong(0) !== r.getLong(1))
    }
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val s = rows.sortBy(_.getInt(4))
      assert(s.map(_.getInt(4)).toSeq === (1 to s.length),
        "per-anchor ranks must be consecutive from 1")
      assert(s.sliding(2).forall(p =>
        p.length < 2 || p(0).getDouble(3) >= p(1).getDouble(3)),
        "per-anchor negatives must rank by descending cosine")
    }
  }

  test("corpus_source_profile: planted dups counted, under-counts impossible") {
    // src0: docs 2,4 duplicate text + unique doc 6 → dup_docs 2;
    // src1: all unique → dup_docs 0
    val d = docs(
      2L -> "same text here", 4L -> "same text here", 6L -> "unique zz",
      1L -> "one", 3L -> "three words in here")
    val out = CorpusOps.sourceProfile(d).collect()
    val bySrc = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(5), r.getLong(3))).toMap
    assert(bySrc("src0") === ((3L, 2L, 1L)))
    assert(bySrc("src1") === ((2L, 0L, 1L)))
    assert(out.map(_.getLong(1)).sum === d.count())
  }

  test("ts_autocorr: anti-phase two-day series scores exactly -0.5 at lag 24") {
    // day 1: 3 events every hour; day 2: 1 event every hour. Deviations
    // are ±c, every lag-24 pair crosses phase (+c·−c), and exactly half
    // the hours have partners: r = 24·(−c²) / 48·c² = −0.5 exactly.
    val evs = (0 until 24).flatMap { h =>
      val day1 = (0 until 3).map(i =>
        (h * 10L + i, 1L, ts(f"2024-01-01 $h%02d:0$i:00"), "e", 1.0))
      val day2 = Seq((1000L + h, 1L, ts(f"2024-01-02 $h%02d:00:00"), "e", 1.0))
      day1 ++ day2
    }
    val out = StreamBatchOps.autocorr(
      evs.toDF("event_id", "user_id", "ts", "event_type", "value")).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 24L, "one lag-24 pair per day-1 hour")
    assert(out(0).getDouble(2) === -0.5)
    // a flat series has zero variance — den=0 rows must drop, not NaN
    val flat = (0 until 4).map(h =>
      (h.toLong, 1L, ts(f"2024-01-01 0$h:00:00"), "e", 1.0))
    assert(StreamBatchOps.autocorr(
      flat.toDF("event_id", "user_id", "ts", "event_type", "value")).count() === 0)
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
