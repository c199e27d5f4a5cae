package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.{SparkSpec, Tables}

/** `dedup_semantic_ivf` guarantees (SemDeDup, Abbas et al. 2023). The
  * operator is declared ✗ in SURVEY §2 (the KMeans fit is not
  * SQL-expressible, same as `sim_ann_ivf`), so this spec carries what
  * the oracle gate cannot: planted-duplicate recall, exemplar
  * determinism, the one-keeper-per-group invariant, and the maxCell
  * hot-cell cap (r9 verdict #4 done-criteria).
  */
class SemanticIvfSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf())

  private def run(df: org.apache.spark.sql.DataFrame) = {
    val rows = df.collect()
    ColumnBridge.releaseAllCheckpoints(df)
    rows
  }

  test("planted exact duplicates: 100% grouped with their source, one keeper each") {
    // withReingested plants an id-shifted exact copy of every 50th
    // vector — cosine 1.0, so every planted pair MUST be a semantic dup
    // at any honest tau, and KMeans assigns identical vectors to the
    // same cell, so within-cell pairing cannot miss them
    val corpus = VectorOps.withReingested(emb)
    val out = run(DedupOps.semanticIvf(corpus, tau = 0.95))
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(2), r.getInt(4))).toMap // vec_id -> (grp, keep)
    val planted = out.map(_.getLong(0)).filter(_ >= 1000000L)
    assert(planted.nonEmpty, "fixture lost its planted copies")
    planted.foreach { dup =>
      val src = dup - 1000000L
      assert(byId(dup)._1 == byId(src)._1,
        s"planted copy $dup not grouped with source $src")
      assert(byId(dup)._2 + byId(src)._2 == 1,
        s"pair ($src, $dup): exactly one of an exact-dup pair may be kept")
    }
  }

  test("every group keeps exactly one exemplar; singletons always keep themselves") {
    val corpus = VectorOps.withReingested(emb)
    val out = run(DedupOps.semanticIvf(corpus, tau = 0.95))
    assert(out.length == corpus.count(), "one row per vector")
    val perGroup = out.groupBy(_.getLong(2))
    perGroup.foreach { case (g, members) =>
      assert(members.map(_.getInt(4)).sum == 1,
        s"group $g keeps ${members.map(_.getInt(4)).sum} members, want 1")
    }
    // the generated vectors are near-orthogonal (max pairwise cos ~0.51
    // at this scale), so every UNPLANTED vector is a singleton keeper
    val unplanted = out.filter(r => r.getLong(0) < 1000000L &&
      r.getLong(0) % 50 != 0)
    assert(unplanted.forall(_.getInt(4) == 1),
      "an un-duplicated vector was dropped")
  }

  test("exemplar selection is deterministic across invocations") {
    val corpus = VectorOps.withReingested(emb)
    def keptSet = run(DedupOps.semanticIvf(corpus, tau = 0.95))
      .filter(_.getInt(4) == 1).map(_.getLong(0)).toSet
    val a = keptSet
    val b = keptSet
    assert(a == b, "kept set changed between identical invocations")
    // and the keeper rule is the paper's: within a multi-member group
    // the kept member has the group-minimum centroid similarity
    val out = run(DedupOps.semanticIvf(corpus, tau = 0.95))
    out.groupBy(_.getLong(2)).filter(_._2.length > 1).foreach {
      case (g, members) =>
        val kept = members.find(_.getInt(4) == 1).get
        val minCos = members.map(_.getDouble(3)).min
        assert(kept.getDouble(3) == minCos,
          s"group $g keeper is not the centroid-similarity minimum")
    }
  }

  test("maxCell cap drops dense cells from pairing — everything becomes a singleton keeper") {
    // cap below every cell population: no pair may materialize, so the
    // planted duplicates all survive as their own groups (the documented
    // recall trade of the cap, bounded-work side)
    val corpus = VectorOps.withReingested(emb)
    val out = run(DedupOps.semanticIvf(corpus, tau = 0.95, maxCell = 1))
    assert(out.forall(_.getInt(4) == 1), "capped run must keep everything")
    assert(out.map(_.getLong(2)).distinct.length == out.length,
      "capped run must produce only singleton groups")
  }

  test("dedup_semantic_ivf registers and the block store returns to baseline") {
    // release hygiene: the registry entry's result is checkpoint-backed
    // (CC labels); the Bench/Verify release walk must reach the blocks
    val sc = spark.sparkContext
    // shared IVF index is deliberately persistent — build it first so
    // the baseline includes it (the Bench storage-check convention)
    VectorOps.cachedIvfIndex(emb)
    val base = sc.getPersistentRDDs.keySet
    (1 to 2).foreach { i =>
      val df = graft.SparkEntry.queries("dedup_semantic_ivf")(spark, sf())
      assert(df.count() > 0)
      ColumnBridge.releaseAllCheckpoints(df)
      val leaked = sc.getPersistentRDDs.keySet -- base
      assert(leaked.isEmpty,
        s"invocation $i leaked ${leaked.size} persisted RDD(s)")
    }
  }
}
