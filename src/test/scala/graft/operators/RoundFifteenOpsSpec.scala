package graft.operators

import graft.SparkSpec

/** Hand-computed semantic pins for the round-15 additions. */
class RoundFifteenOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Toy purchase rows for a known bipartite graph: c1→{s1,s2}, c2→{s1}.
    * Hand-run HITS (L∞ micro-units, 2 iterations):
    *   iter 1: auth_raw s1=2e6, s2=1e6 → auth s1=10^6, s2=500000;
    *           hub_raw c1=1.5e6, c2=10^6 → hub c1=10^6, c2=666666
    *   iter 2: auth_raw s1=1666666, s2=10^6 → auth s1=10^6, s2=600000
    *           (10^6·10^6 DIV 1666666 = 600000);
    *           hub_raw c1=1.6e6, c2=10^6 → hub c1=10^6, c2=625000 */
  private def toyPurchases = {
    // (custkey, suppkey): c1→s1, c1→s2, c2→s1
    val edges = Seq((1L, 10L), (1L, 20L), (2L, 10L))
    val orders = edges.zipWithIndex
      .map { case ((c, _), i) => (100L + i, c) }
      .toDF("o_orderkey", "o_custkey")
    val lineitem = edges.zipWithIndex
      .map { case ((_, s), i) => (100L + i, s) }
      .toDF("l_orderkey", "l_suppkey")
    (orders, lineitem)
  }

  test("graph_hits: two-iteration L-infinity HITS matches the hand computation") {
    val (orders, lineitem) = toyPurchases
    val out = GraphOps.hits(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("authority", 10L, 1000000L), ("authority", 20L, 600000L),
      ("hub", 1L, 1000000L), ("hub", 2L, 625000L)))
  }

  test("agg_mutual_info: a perfectly dependent table prices ln(2) per cell; independence prices 0") {
    // 2 langs × 2 sources, diagonal-only: p(l,s)=1/2 on the diagonal,
    // marginals 1/2 each → PMI = ln(2) = 0.693147 → pmi_micro 693147,
    // contribution = pmi_micro·o DIV n = 693147·2 DIV 4 = 346573
    val dep = Seq((1L, "en", "a"), (2L, "en", "a"), (3L, "fr", "b"), (4L, "fr", "b"))
      .toDF("doc_id", "lang", "source")
    val out = Aggs.mutualInfo(dep).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("en", "a", 2L, 693147L, 346573L),
      ("fr", "b", 2L, 693147L, 346573L)))
    // independent 2×2 (every cell equal): PMI = ln(1) = 0 everywhere
    val ind = Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "fr", "a"), (4L, "fr", "b"))
      .toDF("doc_id", "lang", "source")
    val zeros = Aggs.mutualInfo(ind).collect().map(_.getLong(5))
    assert(zeros.forall(_ == 0L))
  }

  test("sample_reservoir_group: per-group top-k is weight-biased and deterministic") {
    // two langs, long docs should win more often (A-ES key favors high
    // weight); exact values replay the md5 device, so determinism is
    // the assertable contract plus k-bound and per-group ranks
    val docs = (1L to 40L).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      (i, s"doc body $i ${"x" * (i % 7).toInt}", lang, 10L + (i % 13) * 37L)
    }.toDF("doc_id", "text", "lang", "n_chars")
    val out = CorpusOps.sampleReservoir(docs, k = 5)
    val rows = out.collect()
    assert(rows.length == 10) // 5 per lang
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet == Set("en", "fr"))
    byLang.values.foreach { g =>
      assert(g.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // scores are non-increasing with rank
      val scores = g.sortBy(_.getInt(1)).map(_.getLong(4)).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // deterministic: a second construction returns identical rows
    val again = CorpusOps.sampleReservoir(docs, k = 5).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("PQ encode/topk: exact duplicates share a code and tie at the ADC top") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 39L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    // vec 39 is an exact copy of vec 0 — the planted PQ-recall target
    val docs = (base :+ ((39L, base.head._2.clone()))).toDF("vec_id", "embedding")
    val enc = VectorOps.pqEncode(docs).collect()
    assert(enc.length == 40)
    val byId = enc.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(0L) == byId(39L), "identical vectors must encode identically")
    // packed code fits 8 × 4 bits; recon error is a true sqdist (≥ ~0)
    enc.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(1) < (1L << 32))
      assert(r.getLong(2) >= -1L, s"negative recon err: ${r.getLong(2)}")
    }
    val top = VectorOps.pqTopK(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // probe 0 and its exact copy share the minimal ADC; vec_id breaks the tie
    assert(top.take(2).map(_._1).toSeq == Seq(0L, 39L),
      s"planted duplicate not at the ADC top: ${top.take(3).toSeq}")
    assert(top(0)._2 == top(1)._2, "exact copies must tie on ADC")
    // deterministic across constructions (cached codebook, pure plans)
    val again = VectorOps.pqTopK(docs).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(top.toSeq == again.toSeq)
  }

  test("dedup pairs cache: row-identical on/off, one entry per (corpus, params)") {
    def session(on: Boolean) = {
      val s = spark.newSession()
      s.conf.set(DedupPairsCache.ConfKey, on.toString)
      s
    }
    val sOn = session(true)
    val sOff = session(false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val dOn = graft.Tables.documents(sOn, sf())
    val dOff = graft.Tables.documents(sOff, sf())
    // conf-off registers nothing
    DedupOps.nearMinhash(dOff).collect()
    assert(graft.plans.ProjectionCache.entryCountFor(sOff, "dedup") == 0)
    // on: identical rows, one entry, second construction adds none
    val ref = rows(DedupOps.nearMinhash(dOff))
    assert(rows(DedupOps.nearMinhash(dOn)) == ref)
    assert(graft.plans.ProjectionCache.entryCountFor(sOn, "dedup") == 1)
    assert(rows(DedupOps.nearMinhash(dOn)) == ref)
    assert(graft.plans.ProjectionCache.entryCountFor(sOn, "dedup") == 1,
      "same (corpus, params) must not write a second entry")
    // different params → new entry; ngram family keys separately
    DedupOps.ngramJaccard(dOn).collect()
    assert(graft.plans.ProjectionCache.entryCountFor(sOn, "dedup") == 2)
    assert(rows(DedupOps.ngramJaccard(dOn)) == rows(DedupOps.ngramJaccard(dOff)))
    // downstream consumers ride the cache and agree with uncached
    assert(rows(DedupOps.clusterSizeHist(dOn)) ==
      rows(DedupOps.clusterSizeHist(dOff)))
  }

  test("graph_hits: duplicate purchases collapse (distinct-pair projection)") {
    // the same (cust, supp) pair bought twice must not double its vote
    val orders = Seq((100L, 1L), (101L, 1L), (102L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((100L, 10L), (101L, 10L), (102L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    // edges after distinct: c1→s1, c2→s1 — symmetric, so both hubs tie
    // at 10^6 and the single authority is 10^6
    val out = GraphOps.hits(orders, lineitem).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("authority", 10L, 1000000L),
      ("hub", 1L, 1000000L), ("hub", 2L, 1000000L)))
  }
}
