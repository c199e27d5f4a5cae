package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed semantic pins for the round-14 fixes. */
class RoundFourteenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline_dpo_format: NULL-lang docs leave the salt tier's output identical to the window path") {
    // r13 ADVICE: the salt tier joined counts onto the UNION of both
    // branches with a null-rejecting equi-join, so NULL-lang rows
    // vanished from the ranked table whenever a mega-language
    // activated the tier — contradicting the 'NULL lang stays on the
    // window path' contract. The fix computes n with the count window
    // on the window branch (exactly the common path) and joins counts
    // only onto the mega branch (whose langs are non-null by
    // construction). The user-visible output drops NULL-lang pairs at
    // the final lang-keyed pairing in BOTH tiers; this pins the
    // tiers equal in the presence of NULL lang, mega lang, and a
    // normal lang together.
    val docs = Seq(
      (1L, "a a a a", "en"), (2L, "a b c d", "en"), (3L, "a b a b", "en"),
      (4L, "x y z x", "en"), (5L, "x y z w", "en"), (6L, "x x y z", "en"),
      (7L, "u v w x", "fr"), (8L, "u u v w", "fr"),
      (9L, "p q r s", null), (10L, "p p q r", null))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val base = rows(CorpusOps.dpoFormat(docs))
    assert(base.nonEmpty)
    val conf = spark.conf
    try {
      conf.set("spark.graft.dpo.maxLangRows", "3") // en (6 docs) salts
      assert(rows(CorpusOps.dpoFormat(docs)) === base)
    } finally conf.unset("spark.graft.dpo.maxLangRows")
  }

  test("pipeline_pack_sequences: hand-computed next-fit-decreasing on two ranges + an oversize doc") {
    // budget 10, 2 ranges. Fit docs ranked (n DESC, id):
    // 1(7) 2(6) 3(5) | 4(4) 5(3) -> ceil(5/2)=3 per range.
    // Range 0 next-fit: 7 -> bin0; 7+6>10 -> bin1; 6+5>10 -> bin2 (3 bins).
    // Range 1: 4 -> bin0; 4+3=7<=10 -> bin0 (1 bin, global id 3).
    // Doc 6 (12 tokens) overflows the budget -> explicit oversize row.
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, txt(7)), (2L, txt(6)), (3L, txt(5)),
      (4L, txt(4)), (5L, txt(3)), (6L, txt(12)))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.packSequences(docs, budget = 10, nRanges = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    assert(got === Seq(
      (1L, 7L, 0L, 0L, 0), (2L, 6L, 0L, 1L, 0), (3L, 5L, 0L, 2L, 0),
      (4L, 4L, 1L, 3L, 0), (5L, 3L, 1L, 3L, 0), (6L, 12L, -1L, -1L, 1)))
  }

  test("pipeline_pack_sequences: every bin's fill respects the budget on the real corpus") {
    val docs = graft.Tables.documents(spark, sf())
    val out = CorpusOps.packSequences(docs) // budget 256
    val overfilled = out.filter(col("oversize") === 0)
      .groupBy("bin_id").agg(sum(col("n_tokens")).as("fill"))
      .filter(col("fill") > 256).count()
    assert(overfilled == 0L, "a bin exceeded the strict budget")
    // every oversize row really is over budget, and nothing is dropped
    assert(out.filter(col("oversize") === 1 && col("n_tokens") <= 256)
      .count() == 0L)
    assert(out.count() == docs.count())
  }

  test("graph_label_prop: hand-simulated 3-round sync LPA — absorption and the 2-cycle pair") {
    // Co-purchase graph: triangle {1,2,3} + pendant 3-4 (one component)
    // and the isolated pair {10,11}; every edge backed by 2 orders so
    // minSupport=2 keeps exactly these. Sync LPA by hand:
    //   r1: 1->2 (tie {2,3}), 2->1, 3->1 (tie {1,2,4}), 4->3,
    //       10->11, 11->10
    //   r2: 1->1 (plurality {1,1} from 2,3), 2->1, 3->1, 4->1,
    //       pair swaps back (the classic sync-LPA 2-cycle)
    //   r3: component absorbed at label 1; pair mid-swap: 10->11, 11->10
    // Communities: (1, 4 members, min 1), then the pair's two
    // singletons — (10, 1, 11) and (11, 1, 10): label vs member differ
    // mid-cycle, which the spec pins on purpose.
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L),
      (5L, 10L), (5L, 11L), (6L, 10L), (6L, 11L))
      .toDF("l_orderkey", "l_partkey")
    val got = GraphOps.labelProp(li, minSupport = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 4L, 1L), (10L, 1L, 11L), (11L, 1L, 10L)))
  }

  test("emb_matryoshka_recall: a prefix-dominant vector displaces a full-dim winner") {
    // probe 0 = (1,0,0,0). Truncated to 2 dims, vec 1 = (1,0,-1,-1)
    // scores a perfect 1.0 and (with vec 2) fills top-2, displacing
    // vec 3 — the full-dim winner. Full top-2 = {3 (cos 1.0),
    // 2 (0.707)}; trunc top-2 = {1, 2} (both 1.0, id tiebreak).
    // Overlap = {2} -> hits 1, recall 1/2.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, -1f, -1f), 0),
      (2L, Array(1f, 0f, 1f, 0f), 0),
      (3L, Array(1f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.matryoshkaRecall(emb, nProbes = 1, k = 2,
      dims = Seq(2), fullDim = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((2, 1L, 500000L)))
  }

  test("ts_holt: hand-computed integer Holt recurrence incl. the single-day degenerate") {
    // user 1: day-sums 4e6 then 8e6 micro.
    //   t1: l=4000000, b=0
    //   t2: l=(8e6+3*(4e6+0))/4=5000000, b=((5e6-4e6)+0)/2=500000
    //   forecast7 = 5e6+7*5e5 = 8500000
    // user 2: one day -> level=x, trend=0, forecast=level.
    // Two same-day events for user 1 check the pre-sum (1.5+2.5=4).
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 06:00:00")
    val ts0b = java.sql.Timestamp.valueOf("2024-01-01 18:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-01-02 06:00:00")
    val events = Seq(
      (1L, ts0, 1.5), (1L, ts0b, 2.5), (1L, ts1, 8.0),
      (2L, ts0, 3.0))
      .toDF("user_id", "ts", "value")
    val got = StreamBatchOps.holtForecast(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1L, 2L, 5000000L, 500000L, 8500000L),
      (2L, 1L, 3000000L, 0L, 3000000L)))
  }

  test("pipeline_token_budget: strict longest-first cap, no straddle, null-safe source") {
    // source s: docs 3/2/2 tokens, budget 5 -> keep A(3), B(2) (cum 5),
    // drop C (would make 7). NULL source is its own budget bucket.
    val docs = Seq(
      (1L, "a b c", "s"), (2L, "d e", "s"), (3L, "f g", "s"),
      (4L, "h i j k l m", null))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.tokenBudgetMix(docs, budget = 5L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, Some("s"), 3L, 3L), (2L, Some("s"), 2L, 5L)))
    // a 6-token NULL-source doc under a budget that admits it survives
    // the null-safe offset join
    val got2 = CorpusOps.tokenBudgetMix(docs, budget = 6L)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got2.contains((4L, None)))
  }

  test("graph_kcore: the peel CASCADE — a degree-3 node dies in round 2 after its pendant is peeled") {
    // K4 {1,2,3,4}; node 5 hangs off 1,2 and pendant 6. Degrees:
    // 1:4, 2:4, 3:3, 4:3, 5:3, 6:1. Round 1 peels 6 (deg 1 < 3);
    // round 2 peels 5 (deg fell 3 -> 2 — the cascade a plain degree
    // filter misses); round 3 stable. Survivors: K4 at degree 3 each.
    // Every edge gets exactly two 2-part orders (support 2, no stray
    // pairs from wider orders).
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (2L, 5L), (5L, 6L))
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((2L * i, a), (2L * i, b), (2L * i + 1, a), (2L * i + 1, b))
    }.toDF("l_orderkey", "l_partkey")
    val got = GraphOps.kcorePeel(li, k = 3, minSupport = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("agg_chi2: hand-computed integer micro contingency incl. truncating division") {
    // cells: (en,s1,3) (en,s2,1) (fr,s2,2); N=6, R(en)=4, R(fr)=2,
    // C(s1)=3, C(s2)=3.
    //  (en,s1): E=(4*3*1e6)//6=2000000, dev=+1e6, chi2=(1e12*1e6)//(2e12)=500000
    //  (en,s2): E=2000000, dev=-1e6, chi2=500000
    //  (fr,s2): E=1000000, dev=+1e6, chi2=1000000
    val docs = Seq(
      (1L, "en", "s1"), (2L, "en", "s1"), (3L, "en", "s1"),
      (4L, "en", "s2"), (5L, "fr", "s2"), (6L, "fr", "s2"))
      .map { case (id, l, s) => (id, "t", l, s, 1L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Aggs.chi2(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      ("en", "s1", 3L, 2000000L, 500000L),
      ("en", "s2", 1L, 2000000L, 500000L),
      ("fr", "s2", 2L, 1000000L, 1000000L)))
  }

  test("stream_dedup_batch: min-struct keeper picks earliest (ts, event_id); hour buckets split keys") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // user 1 click, hour 0: id 2 arrives EARLIER than id 1 -> kept
      (2L, ts("2024-01-01 00:10:00"), 1L, "click", 2.00),
      (1L, ts("2024-01-01 00:20:00"), 1L, "click", 1.00),
      // same user+type next hour: separate bucket
      (3L, ts("2024-01-01 01:05:00"), 1L, "click", 3.00),
      // tie on ts -> smaller event_id kept
      (5L, ts("2024-01-01 00:30:00"), 2L, "view", 5.00),
      (4L, ts("2024-01-01 00:30:00"), 2L, "view", 4.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val h0 = 1704067200L // 2024-01-01 00:00 UTC
    val got = StreamBatchOps.dedupBatch(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      (h0, 1L, "click", 2L, 200L, 1L),
      (h0, 2L, "view", 4L, 400L, 1L),
      (h0 + 3600L, 1L, "click", 3L, 300L, 0L)))
  }

  test("emb_mutual_knn: one-directional kNN links are dropped, ties break on neighbor id") {
    // v0 = v3 = (1,0); v1 = (0,1); v2 = (.8,.6). k=2 top lists:
    //   v0: [v3 cos 1.0, v2 cos .8]      v1: [v2 cos .6, v0 cos 0 (id tie)]
    //   v2: [v0 cos .8 (id tie with v3), v3]   v3: [v0 1.0, v2 .8]
    // Mutual: (0,2) (0,3) (2,3). v1→v2 and v1→v0 are one-directional
    // (neither v2 nor v0 lists v1) — the asymmetry mutuality filters.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0f, 1f, 0f, 0f), 0),
      (2L, Array(0.8f, 0.6f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.mutualKnn(emb, nNodes = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(t => (t._1, t._2)) === Seq((0L, 2L), (0L, 3L), (2L, 3L)))
    assert(got(1)._3 === 1000000L) // identical vectors: cos exactly 1
    // float-widened (.8,.6) is not unit norm: cos lands just UNDER .8
    assert(got(0)._3 === 799999L && got(2)._3 === 799999L)
  }

  test("pipeline_pack_waste: decile rollup of hand-packed bins") {
    // tokens [5,4,3,2], budget 8, one range. Next-fit-decreasing:
    // bin0 = {5} (5+4 overflows), bin1 = {4,3}, bin2 = {2}.
    // Fills 5/7/2 -> deciles (f*10 DIV 8) = 6/8/2.
    val docs = Seq(
      (1L, "a a a a a"), (2L, "b b b b"), (3L, "c c c"), (4L, "d d"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.packWaste(docs, budget = 8, nRanges = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (2L, 1L, 1L, 2L, 6L), (6L, 1L, 1L, 5L, 3L), (8L, 1L, 2L, 7L, 1L)))
  }

  test("corpus_pareto_sources: rank ties on source id, NULL source ranks after named ties") {
    // totals: s1=6, s2=3, s3=3 (tie -> source asc), null=1; total 13
    val docs = Seq(
      (1L, "a b c d e f", Some("s1")), (2L, "a b c", Some("s2")),
      (3L, "x y z", Some("s3")), (4L, "q", None))
      .map { case (id, t, src) => (id, t, "en", src.orNull, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.paretoSources(docs)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      (Some("s1"), 1, 6L, 461538L), (Some("s2"), 2, 3L, 692307L),
      (Some("s3"), 3, 3L, 923076L), (None, 4, 1L, 1000000L)))
  }

  test("agg_benford: digit from the cents string head; negatives and NULLs excluded") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (1L, 1.00), (2L, 1.50), (3L, 2.00), (4L, 9.99), (5L, -1.00))
      .map { case (id, v) => (id, ts0, 1L, "click", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Aggs.benford(events)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (1, 2L, 500000L, 301029L, 198971L),
      (2, 1L, 250000L, 176091L, 73909L),
      (9, 1L, 250000L, 45757L, 204243L)))
  }

  test("text_vocab_growth: first-occurrence deciles, zero-new-type deciles kept at 0") {
    // 5 docs -> deciles (rn-1)*10 DIV 5 = 0,2,4,6,8. Types: doc1 {a,b},
    // doc2 {b,c}, doc3 {a}, doc4 {c,a}, doc5 {d}. New types: d0 {a,b}=2,
    // d2 {c}=1, d4 0, d6 0, d8 {d}=1. cum: 2,3,3,3,4.
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "a"), (4L, "c a"), (5L, "d"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.vocabGrowth(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq(
      (0L, 1L, 2L, 2L, 2L), (2L, 1L, 2L, 1L, 3L), (4L, 1L, 1L, 0L, 3L),
      (6L, 1L, 2L, 0L, 3L), (8L, 1L, 1L, 1L, 4L)))
  }

  test("agg_hhi: monopoly scores 10^6, even split scores 1/k, NULL user is one cell") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      // 'mono': one user, 3 events -> HHI = 1e6
      (1L, 1L, "mono"), (2L, 1L, "mono"), (3L, 1L, "mono"),
      // 'split': two users 2+2 -> (4+4)*1e6 DIV 16 = 500000
      (4L, 1L, "split"), (5L, 1L, "split"), (6L, 2L, "split"), (7L, 2L, "split"))
      .map { case (id, u, t) => (id, ts0, u, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Aggs.hhi(events)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("mono", 1L, 3L, 1000000L), ("split", 2L, 4L, 500000L)))
  }

  test("ts_mk_trend: S counts sign pairs over daily sums; ties contribute 0; single-day users drop") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 06:00:00")
    val events = Seq(
      // user 1: days 1..4 sums 1,2,2,3 -> pairs: (1,2)+,(1,2)+,(1,3)+,
      // (2,2)0,(2,3)+,(2,3)+ -> S=5 of 6 pairs, trend +1
      (1L, ts(1), 1.0), (1L, ts(2), 2.0), (1L, ts(3), 2.0), (1L, ts(4), 3.0),
      // user 2: 3,1 -> S=-1, trend -1
      (2L, ts(1), 3.0), (2L, ts(2), 1.0),
      // user 3: single day -> no pairs, absent
      (3L, ts(1), 9.0))
      .map { case (u, t, v) => (u * 100 + t.getTime % 97, t, u, "e", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = StreamBatchOps.mkTrend(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(got === Seq((1L, 6L, 5L, 1), (2L, 1L, -1L, -1)))
  }

  test("graph_modularity: hand-computed Newman contributions on the LPA fixture") {
    // Same graph as the label_prop spec: triangle {1,2,3} + pendant 3-4
    // and the pair {10,11}. After 3 sync rounds: {1,2,3,4} -> label 1;
    // 10 and 11 mid-swap (10->11, 11->10). m=5 edges, 4m^2=100.
    //   community 1:  intra 4, degree 8 -> (4*20-64)*1e6 // 100 = 160000
    //   community 10: intra 0, degree 1 (node 11) -> -1e6 // 100 = -10000
    //   community 11: intra 0, degree 1 (node 10) -> -10000
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L),
      (5L, 10L), (5L, 11L), (6L, 10L), (6L, 11L))
      .toDF("l_orderkey", "l_partkey")
    val got = GraphOps.modularity(li, minSupport = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 4L, 8L, 160000L), (10L, 0L, 1L, -10000L),
      (11L, 0L, 1L, -10000L)))
  }

  test("agg_ks_test: cross-multiplied CDF gap, max at the smallest attaining cents") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // clicks [1,2,3], views [2,4]; gaps at 100/200/300/400 cents =
    // 333333/166666/500000/0 -> D=500000 at 300
    val events = Seq(
      ("click", 1.00), ("click", 2.00), ("click", 3.00),
      ("view", 2.00), ("view", 4.00),
      ("error", 9.00)) // other types excluded
      .zipWithIndex
      .map { case ((t, v), i) => (i.toLong, ts0, 1L, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Aggs.ksTest(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((3L, 2L, 500000L, 300L)))
  }

  test("dedup_minhash_calibration: identical docs sit on the (32, 1e6) diagonal point") {
    // Three byte-identical docs: identical shingle sets and signatures,
    // so all three pairs land at lane_matches = 32 with exact Jaccard
    // 10^6 — est_micro = 32*1e6 DIV 32 = 1e6: the diagonal's top end.
    val same = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, same), (2L, same), (3L, same),
      (4L, "completely different words here entirely unrelated stream"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DedupOps.minhashCalibration(docs)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got.contains((32, 3L, 1000000L, 1000000L)))
    // every group's mean true jaccard and estimate stay in [0, 1e6]
    assert(got.forall(t => t._3 >= 0 && t._3 <= 1000000L &&
      t._4 >= 0 && t._4 <= 1000000L))
  }

  test("ts_theilsen: lower-median pairwise slope; negative slopes truncate toward zero") {
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-$d%02d 06:00:00")
    val events = Seq(
      // user 1: days 1,2,3 = 1/3/2 -> slopes {2e6, 5e5, -1e6}; lower
      // median (rank 2 of 3 ascending) = 500000
      (1L, ts(1), 1.0), (1L, ts(2), 3.0), (1L, ts(3), 2.0),
      // user 2: one pair, slope 3e6
      (2L, ts(1), 1.0), (2L, ts(2), 4.0),
      // user 3: single day -> absent
      (3L, ts(1), 9.0),
      // user 4: -7 micro over 2 days -> -7 DIV 2 = -3 (toward zero;
      // floor division would say -4 — the load-bearing choice)
      (4L, ts(1), 0.0), (4L, ts(3), -0.000007))
      .zipWithIndex
      .map { case ((u, t, v), i) => (i.toLong, t, u, "e", v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = StreamBatchOps.theilSen(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3L, 500000L), (2L, 1L, 3000000L),
      (4L, 1L, -3L)))
  }

  test("agg_mannwhitney: doubled midranks keep tied ranks integer; AUC is the pair win-rate") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // clicks [1,2,3], views [2,4]: ranks 1, 2.5, 4 -> R_a = 7.5
    // (R2=15), U_a = 1.5 (U2=3); direct pair count: a>b once (3>2),
    // a=b once (2=2, worth 0.5) of 6 pairs -> AUC 0.25
    val events = Seq(
      ("click", 1.00), ("click", 2.00), ("click", 3.00),
      ("view", 2.00), ("view", 4.00), ("error", 9.00))
      .zipWithIndex
      .map { case ((t, v), i) => (i.toLong, ts0, 1L, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Aggs.mannWhitney(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq((3L, 2L, 3L, 250000L)))
  }

  test("corpus_simpson_diversity: repeat probability per lang; single-token langs drop") {
    // en: tokens {a,a,b,a} -> n_a=3, n_b=1, rep=6, N=4 -> 6e6//(4*3)=500000
    // fr: {x,y} -> rep 0 -> 0; de: single token -> filtered (N(N-1)=0)
    val docs = Seq(
      (1L, "a a b", "en"), (2L, "a", "en"), (3L, "x y", "fr"),
      (4L, "z", "de"))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.simpsonDiversity(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("en", 4L, 2L, 500000L), ("fr", 2L, 2L, 0L)))
  }

  test("scan_partition_prune: pruned read equals the direct filtered aggregate; other langs gone") {
    val docs = Seq(
      (1L, "t", "en", "s", 5L), (2L, "t", "en", "s", 7L),
      (3L, "t", "fr", "s", 11L), (4L, "t", "de", "s", 13L),
      (5L, "t", null, "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Scans.scanPartitionPrune(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("en", 2L, 12L, 3L), ("fr", 1L, 11L, 3L)))
  }

  test("pipeline_cdc_apply: latest version wins; delete beats earlier updates; untouched keys pass through") {
    // id 1: no changes -> v1. id 7: v2 update. id 3: v3 update.
    // id 21 (3 AND 7): both updates -> the LATER v3 wins, 2 changes.
    // id 13: deleted. id 39 (3 AND 13): v3 update then v4 delete ->
    // delete wins, key gone.
    val docs = Seq(1L, 3L, 7L, 13L, 21L, 39L)
      .map(id => (id, "t", "en", "s", id * 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.cdcApply(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(
      (1L, 1, 0L, 10L), (3L, 3, 1L, 2030L), (7L, 2, 1L, 1070L),
      (21L, 3, 2L, 2210L)))
  }

  test("sim_hamming_topk: popcount distance over sign words; zero ties to full flip") {
    // probe 0: all-positive signs. v1 identical signs -> hamming 0;
    // v2 flips dim 0 only -> 1; v3 all-negative -> 64.
    def vec(f: Int => Float) = Array.tabulate(64)(f)
    val emb = Seq(
      (0L, vec(_ => 1f), 0),
      (1L, vec(i => (i + 1).toFloat), 0),
      (2L, vec(i => if (i == 0) -1f else 2f), 0),
      (3L, vec(_ => -1f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.hammingTopK(emb, nProbes = 1, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(got === Seq((0L, 1L, 0L, 1), (0L, 2L, 1L, 2), (0L, 3L, 64L, 3)))
  }

  test("sim_range_search: whole neighborhood at the integer micro threshold, probe excluded") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(2f, 0f, 0f, 0f), 0),  // cos 1.0        -> 1000000
      (2L, Array(1f, 1f, 0f, 0f), 0),  // cos 0.70710678 ->  707106
      (3L, Array(0f, 1f, 0f, 0f), 0))  // cos 0          -> excluded
      .toDF("vec_id", "embedding", "label")
    val got = VectorOps.rangeSearch(emb, nProbes = 1, tauMicro = 700000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, 1L, 1000000L), (0L, 2L, 707106L)))
  }
}
