package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Hand-computed pins for the round-16 work: the three bound-verdict
  * sketch flips (VERDICT r15 #1) and the projection-cache ordering fix
  * (ADVICE r15 medium — terminal order must survive a MULTI-file cached
  * projection). */
class RoundSixteenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("agg_approx_distinct verified: exact counts hand-match, verdicts hold") {
    // 2 types: a → users {1,2,3}, b → users {7,7,8}
    val events = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 7L), ("b", 7L), ("b", 8L))
      .toDF("event_type", "user_id")
    val out = Aggs.approxDistinctVerified(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // tiny cardinalities: HLL++ is exact (sparse mode), so the verdict
    // is deterministically true and the exact column is the hand count
    assert(out.toSeq == Seq(("a", 3L, true), ("b", 2L, true)))
  }

  test("agg_hll_shards verified: per-shard + union exact distincts, verdicts hold") {
    val docs = Seq(
      (1L, "alpha beta", "en"), (2L, "beta gamma", "en"),
      (3L, "delta", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusOps.hllShardDistinctVerified(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    // en: {alpha, beta, gamma} = 3; fr: {delta} = 1; union = 4
    assert(out.toSeq == Seq(
      ("__all__", 4L, true), ("en", 3L, true), ("fr", 1L, true)))
  }

  test("agg_heavy_hitters verified: exact top-k ranks and sketch theorems hold") {
    // counts: x=4, y=3, z=2, w=1 over 10 words; capacity 64 >> distinct,
    // so every word is a counter with exact counts (est == cnt, err 0)
    val docs = Seq(
      (1L, "x x y z"), (2L, "x y w"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val out = TextOps.heavyHittersVerified(docs, capacity = 64, topK = 3)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1, "x", 4L, true, true),
      (2, "y", 3L, true, true),
      (3, "z", 2L, true, true)))
  }

  test("agg_heavy_hitters verified: ties in the exact top-k break on the word") {
    val docs = Seq((1L, "b a"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.heavyHittersVerified(docs, capacity = 8, topK = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, "a", 2L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("pq codes cache: terminal order survives a multi-file projection") {
    // a session of its own so the cache entry/dir assertions are scoped
    val s = spark.newSession()
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 96L).map(id => (id, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
      .repartition(8) // the cached projection writes 8 part files
    val ids = VectorOps.pqEncode(emb).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "pqEncode must stay vec_id-ordered")
    assert(ids.size == 96)
    // prove the multi-file case was exercised — with one part file the
    // r15 defect (sort before write, none after read) passed vacuously
    val dirs = graft.plans.ProjectionCache.dirsFor(s, "pq")
    assert(dirs.size == 1, s"expected one pq cache entry, got $dirs")
    val parts = new java.io.File(dirs.head)
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 2, s"projection coalesced to $parts file(s); the ordering pin needs >1")
    // warm read (cache hit) keeps the order too
    val again = VectorOps.pqEncode(emb).select("vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(again == ids)
  }

  test("sim_pq_rerank: exact rerank puts the planted copy on top at cos 1.0") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 39L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val docs = (base :+ ((39L, base.head._2.clone()))).toDF("vec_id", "embedding")
    val out = VectorOps.pqRerank(docs, topR = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // the probe itself and its exact copy lead with exact cosine 1.0 —
    // the rerank tier recovers the exact order even if ADC ties were
    // coarse; vec_id breaks the tie
    assert(out.take(2).toSeq == Seq((0L, 1.0), (39L, 1.0)),
      s"rerank top-2: ${out.take(3).toSeq}")
    assert(out.length == 10)
    // exact-cosine monotone non-increasing
    val cs = out.map(_._2).toSeq
    assert(cs == cs.sorted.reverse)
  }

  test("retrieval_pq_recall: one audited row, recall in [0, 1e6], survivors help") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 40L).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val r = RetrievalOps.pqRecall(docs).collect()
    assert(r.length == 1)
    val (nExact, nHit, recall) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(nExact == 10L)
    assert(nHit >= 1L && nHit <= 10L) // probe itself always survives
    assert(recall == nHit * 1000000L / nExact)
    // widening topR to the corpus makes the two-tier plan exact
    val full = RetrievalOps.pqRecall(docs, topR = 40).collect()(0)
    assert(full.getLong(2) == 1000000L,
      s"topR=corpus must give recall 1.0, got ${full.getLong(2)}")
  }

  test("dedup pairs: terminal order survives the cached projection") {
    val s = spark.newSession()
    import s.implicits._
    // 12 near-dup groups of shared prefixes so pairs exist
    val docs = (0L until 24L).map { i =>
      val g = i % 12
      (i, s"group $g token alpha beta gamma delta " + (if (i < 12) "x" else "y z"))
    }.toDF("doc_id", "text")
    val pairs = DedupOps.nearMinhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == pairs.toSeq.sorted,
      "nearMinhash must stay (id_a, id_b)-ordered after the cache read")
  }
}
