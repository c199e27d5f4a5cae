package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed semantic pins for the round-13 fixes and wave. */
class RoundThirteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bpe trainer/apply: pair-exhausted vocab early-stops and passes words through") {
    // r12 ADVICE: the ORACLE's unrolled iteration used to empty every
    // downstream CTE via CROSS JOIN top_k when the vocabulary ran out
    // of mergeable pairs before `merges` iterations. The fixed oracle
    // (LEFT JOIN ON TRUE + previous-encoding fallback) was verified in
    // DuckDB on exactly these fixtures; this spec pins the Spark side
    // to the same values so the engines provably agree on exhaustion.
    //
    // Fixture A: single-char words — ZERO pairs from iteration 1.
    val a = Seq((1L, "a b c a b"), (2L, "c c a")).toDF("doc_id", "text")
    assert(CorpusOps.bpeMerges(a).collect().isEmpty,
      "no pairs -> trainer must emit zero merges")
    val appA = CorpusOps.bpeApply(a).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(appA.toSeq === Seq(
      (1L, 5L, 5L, md5hex("a | b | c | a | b")),
      (2L, 3L, 3L, md5hex("c | c | a"))))

    // Fixture B: 2-char words exhaust after 2 of the default 5 merges
    // (iter1 a+b->ab cnt 4; iter2 c+d->cd cnt 3; then nothing).
    val b = Seq((1L, "ab ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val m = CorpusOps.bpeMerges(b).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq((1, "a", "b", "ab", 4L), (2, "c", "d", "cd", 3L)))
    val appB = CorpusOps.bpeApply(b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(appB.toSeq === Seq(
      (1L, 4L, 4L, md5hex("ab | ab | ab | cd")),
      (2L, 3L, 3L, md5hex("ab | cd | cd"))))
  }

  // ---- round-13 wave fixtures ----

  /** Co-purchase fixture: a 0-1-2 chain and a separate 3-4 edge, every
    * pair supported by 2 distinct orders (the threshold). */
  private def liChain = Seq(
    (10L, 0L), (10L, 1L), (11L, 0L), (11L, 1L),
    (12L, 1L), (12L, 2L), (13L, 1L), (13L, 2L),
    (14L, 3L), (14L, 4L), (15L, 3L), (15L, 4L))
    .toDF("l_orderkey", "l_partkey")

  test("graph_bfs_depths: chain depths from a single seed; far component lands in -1") {
    // seed = node 0 (nSeeds = 1): 0 at depth 0, 1 at 1, 2 at 2; the
    // {3,4} component is unreached -> two nodes at -1, min node 3
    val got = GraphOps.bfsDepths(liChain, nSeeds = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((-1L, 2L, 3L), (0L, 1L, 0L), (1L, 1L, 1L),
      (2L, 1L, 2L)))
  }

  test("graph_bfs_depths: maxDepth caps the walk; distributed tier agrees with driver tier") {
    val capped = GraphOps.bfsDepths(liChain, nSeeds = 1, maxDepth = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(capped.toSeq === Seq((-1L, 3L, 2L), (0L, 1L, 0L), (1L, 1L, 1L)))
    // maxDriverEdges = 0 forces the frontier-join tier — same result
    val dist = GraphOps.bfsDepths(liChain, nSeeds = 1, maxDriverEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dist.toSeq === Seq((-1L, 2L, 3L), (0L, 1L, 0L), (1L, 1L, 1L),
      (2L, 1L, 2L)))
  }

  private def eventsFrom(rows: Seq[(Long, String, Long, Double)]) =
    rows.map { case (e, ty, s, v) => (e, ty, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(s)), v) }
      .toDF("event_id", "event_type", "ts", "value")
      .withColumn("user_id", lit(1L)).withColumn("props", lit("{}"))

  test("ts_local_extrema: strict peaks/troughs; plateaus and endpoints never qualify; monotone series emits sentinels") {
    // series t: 1, 3, 2, 5, 5, 4 -> one max (3: above 1 and 2), one min
    // (2: below 3 and 5); the 5,5 plateau is NOT a strict max; series
    // m: 1, 2, 3 monotone -> zero extrema, -1 sentinels
    val ev = eventsFrom(Seq(
      (1L, "t", 100L, 1.0), (2L, "t", 200L, 3.0), (3L, "t", 300L, 2.0),
      (4L, "t", 400L, 5.0), (5L, "t", 500L, 5.0), (6L, "t", 600L, 4.0),
      (7L, "m", 100L, 1.0), (8L, "m", 200L, 2.0), (9L, "m", 300L, 3.0)))
    val got = StreamBatchOps.localExtrema(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq === Seq(
      ("m", 3L, 0L, 0L, -1L, -1L, -1L, -1L),
      ("t", 6L, 1L, 1L, 300L, 200L, 2L, 3L)))
  }

  test("text_readability: FRE micro-points and bands on paper") {
    val docs = Seq(
      (1L, "The cat sat."),   // W=3 S=1 Syll=3 (e,a,a)
      (2L, "aa bb cc dd"),    // W=4 S=1 (min) Syll=1 (aa)
      (3L, "Go. Stop! Why?"), // W=3 S=3 Syll=3 (o,o,y)
      (4L, ""))               // zero words -> dropped
      .toDF("doc_id", "text")
    val got = TextOps.readability(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // doc1: 206835000 - 1015000*3/1 - 84600000*3/3 = 119190000
    // doc2: 206835000 - 1015000*4/1 - 84600000*1/4 = 181625000
    // doc3: 206835000 - 3045000/3 - 84600000*3/3 = 121220000
    assert(got.toSeq === Seq(
      (1L, 3L, 1L, 3L, 119190000L, "very_easy"),
      (2L, 4L, 1L, 1L, 181625000L, "very_easy"),
      (3L, 3L, 3L, 3L, 121220000L, "very_easy")))
  }

  test("dedup_url_canonical: all four messy variants collapse to one canonical page") {
    // doc_ids 0..3 are one quartet (same lang) holding the four messy
    // variants — upper host, utm params, trailing slash + fragment —
    // so n_canonical = 1 proves every canonicalization step fired;
    // doc 4 starts the next quartet, doc 5 is another language
    val docs = (0L to 4L).map(i => (i, "x", "en", "s", 1L)) :+
      ((5L, "x", "fr", "s", 1L))
    val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = DedupOps.urlCanonical(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(("en", 5L, 2L, 3L), ("fr", 1L, 1L, 0L)))
  }

  test("scan_merge_schema: merged two-generation read audits exactly as the source") {
    val docs = Seq((0L, "en", 10L), (1L, "en", 230L), (2L, "fr", 7L),
      (3L, "fr", 105L)).toDF("doc_id", "lang", "n_chars")
    val got = Scans.scanMergeSchema(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // v2 (odd ids) carries quality = n_chars % 100: en doc1 -> 30,
    // fr doc3 -> 5
    assert(got.toSeq === Seq(("en", 2L, 1L, 240L, 30L),
      ("fr", 2L, 1L, 112L, 5L)))
  }

  test("pipeline_anneal_mix: phase weights and anneal allocation on paper") {
    // A: 10 tokens q=200000 + 10 tokens q=1000000 -> 20 tokens, q=600000
    // B: 10 tokens q=1000000
    // tot_tokens=30 (anneal budget = 3), tot_tq = 22e6
    val docs = Seq(
      (1L, "a b a b a b a b a b", "A"),
      (2L, "c d e f g h i j k l", "A"),
      (3L, "m n o p q r s t u v", "B"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.annealMix(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // w1: 20e6//30=666666 | 10e6//30=333333
    // w2: 12e12//22e6=545454 | 10e12//22e6=454545
    // anneal: 12e6*3//22e6=1 | 10e6*3//22e6=1 (truncation undershoots
    // the 3-token budget — by design, never over-allocates)
    assert(got.toSeq === Seq(
      ("A", 2L, 20L, 600000L, 666666L, 545454L, 1L),
      ("B", 1L, 10L, 1000000L, 333333L, 454545L, 1L)))
  }

  test("pipeline_dpo_format: mega-language salt tier ranks identically to the window path") {
    // en (6 docs) crosses the 3-row knob -> distributedRowNumber tier;
    // fr (2 docs) stays on the window path; results must be identical
    // to the all-window default
    val docs = Seq(
      (1L, "a a a a", "en"), (2L, "a b c d", "en"), (3L, "a b a b", "en"),
      (4L, "x y z x", "en"), (5L, "x y z w", "en"), (6L, "x x y z", "en"),
      (7L, "u v w x", "fr"), (8L, "u u v w", "fr"))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7), r.getLong(8)))
      .toSeq
    val base = rows(CorpusOps.dpoFormat(docs))
    assert(base.nonEmpty)
    val conf = spark.conf
    try {
      conf.set("spark.graft.dpo.maxLangRows", "3")
      val salted = CorpusOps.dpoFormat(docs)
      val got = rows(salted) // execute first: pin origins register on execution
      // the salt tier is structurally visible: window branch ∪ rebased
      // distributedRowNumber branch (the default plan has no Union) —
      // inside the rank pin, so read the origin-expanded plan
      val expanded = graft.plans.PlanPins.expandedExecuted(salted)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("/tmp/dpo_plan.txt"), expanded)
      assert(expanded.contains("Union"),
        "mega tier did not activate under the 3-row knob")
      assert(got === base)
    } finally conf.unset("spark.graft.dpo.maxLangRows")
  }

  test("SinkJanitor: a superseded sink survives while its frame is reachable, dies once it is not") {
    // the r12 ADVICE race: retire-at-next-construction deleted a dir a
    // concurrent un-executed frame still needed. The janitor's contract:
    // deletion only after the owning frame becomes unreachable.
    val tmp = java.nio.file.Files.createTempDirectory("janitor-spec")
    val dirA = tmp.resolve("a"); val dirB = tmp.resolve("b")
    java.nio.file.Files.createDirectories(dirA)
    java.nio.file.Files.createDirectories(dirB)
    var ownerA: AnyRef = new Object
    SinkJanitor.register(spark, "janitor-spec-key", dirA.toString, Nil, ownerA)
    // displace A with B while A's owner is still strongly held: A must
    // survive any number of sweeps
    SinkJanitor.register(spark, "janitor-spec-key", dirB.toString, Nil, new Object)
    assert(java.nio.file.Files.exists(dirA),
      "janitor deleted a sink whose owner is still reachable")
    // drop the owner; once the weak ref clears, the next register sweeps A
    ownerA = null
    val deadline = System.currentTimeMillis + 10000
    var gone = false
    while (!gone && System.currentTimeMillis < deadline) {
      System.gc()
      SinkJanitor.register(spark, "janitor-spec-key2",
        tmp.resolve("c").toString, Nil, new Object)
      gone = !java.nio.file.Files.exists(dirA)
      if (!gone) Thread.sleep(100)
    }
    assert(gone, "janitor never reclaimed an unreachable sink")
  }

  test("corpus_snapshot_diff: added/removed/changed/unchanged partition the id space") {
    // ids 0..6: old = {1,2,4,5}, new = {0,2,3,5,6}; id 2 (≡2 mod 6)
    // changes content in the new snapshot
    val docs = (0L to 6L).map(i => (i, s"text $i", "en", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.snapshotDiff(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(("en", 3L, 2L, 1L, 1L)))
  }

  // ---- round-13 wave 2 fixtures ----

  test("dedup_span_rewrite: first occurrence survives, later copies cut, fully-deduped docs vanish") {
    // k=5 blocks. doc 1 owns both spans; doc 2 repeats doc 1's first
    // block (cut) and keeps its short tail; doc 3 is ENTIRELY doc 1's
    // second block -> vanishes from the output; doc 4 repeats its own
    // first block twice internally -> self-dedup keeps only block 0.
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en"),
      (2L, "a b c d e x y", "en"),
      (3L, "f g h i j", "en"),
      (4L, "p q r s t p q r s t p q r s t", "en"))
      .toDF("doc_id", "text", "lang")
    val got = DedupOps.spanRewrite(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.toSeq === Seq(
      (1L, "en", 2L, 2L, 10L, md5hex("a b c d e f g h i j")),
      (2L, "en", 2L, 1L, 2L, md5hex("x y")),
      (4L, "en", 3L, 1L, 5L, md5hex("p q r s t"))))
  }

  test("corpus_quality_reliability: logit rank, decile arithmetic, and the gold bit edge") {
    // logits ("a" IS a stopword):
    //         d0 "x"*5 -> 2*5-127 = -117, gold 2*1<5 -> 0
    //         d1 "a b c" -> 2*3+5-127 = -116, gold 1
    //         d2 "the the" -> 2*2+5*2-127 = -113, gold 2*1>=2 -> 1 (equality edge)
    //         d3 digits+PII -> 2*3+5-30*11-1000-127 = -1446, gold 1
    // rank asc: d3,d0,d1,d2 -> deciles (rn-1)*10 DIV 4 = 0,2,5,7
    val docs = Seq(
      (0L, "x x x x x"), (1L, "a b c"), (2L, "the the"),
      (3L, "a 12345678901 b"))
      .toDF("doc_id", "text")
    val got = TextOps.qualityReliability(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (0L, 1L, 1L, 1000000L, -1446L, -1446L),
      (2L, 1L, 0L, 0L, -117L, -117L),
      (5L, 1L, 1L, 1000000L, -116L, -116L),
      (7L, 1L, 1L, 1000000L, -113L, -113L)))
  }

  test("ts_gap_islands: islands split on missing days; same-day repeats collapse") {
    def t(day: Long, off: Long = 0L) =
      new java.sql.Timestamp((day * 86400L + off) * 1000L)
    // user 1: days {0,1,2, 5,6, 9} (day 0 twice) -> 3 islands, longest 3,
    // span 10, gaps 4; user 2: single day -> 1 singleton island, 0 gaps
    val events = Seq(
      (t(0), 1L), (t(0, 3600), 1L), (t(1), 1L), (t(2), 1L),
      (t(5), 1L), (t(6), 1L), (t(9), 1L),
      (t(3), 2L))
      .toDF("ts", "user_id")
    val got = StreamBatchOps.gapIslands(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      (1L, 6L, 3L, 3L, 0L, 9L, 4L),
      (2L, 1L, 1L, 1L, 3L, 3L, 0L)))
  }
}
