package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Hand-computed semantic pins for the round-12 wave. The DuckDB oracle
  * proves cross-engine agreement at sf0.01; these prove the SEMANTICS
  * are the intended ones on fixtures small enough to verify on paper.
  */
class RoundTwelveOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, text, lang) => (id, text, lang, "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("pipeline_dpo_format: quality-ranked halves pair deterministically with positive margins") {
    // en scores (distinct-ratio micro): d2 "a b c d" = 1e6, d4 "x y z x"
    // = 750000, d3 "a b a b" = 500000, d1 "a a a a" = 250000 → ranked
    // 2,4,3,1; halves (2,4 | 3,1) pair as (2↔3), (4↔1), margin 500000
    val docs = docsDF(Seq(
      (1L, "a a a a", "en"), (2L, "a b c d", "en"),
      (3L, "a b a b", "en"), (4L, "x y z x", "en")))
    val out = CorpusOps.dpoFormat(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(8)))
    assert(out.toSeq === Seq(("en", 1L, 2L, 500000L), ("en", 2L, 4L, 500000L)))
    val full = CorpusOps.dpoFormat(docs).collect()
    // every pair's margin is non-negative by construction (top half
    // outranks bottom half within a language)
    assert(full.forall(_.getLong(8) >= 0))
  }

  test("pipeline_dpo_format: odd-count language drops exactly the unpairable surplus") {
    val docs = docsDF(Seq(
      (1L, "a a a a", "fr"), (2L, "a b c d", "fr"), (3L, "a b a b", "fr")))
    // n=3 → half=1: chosen {rank1=d2}, rejected {rank2→pair1=d3,
    // rank3→pair2=d1}; only pair_id 1 matches
    val out = CorpusOps.dpoFormat(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq === Seq((1L, 2L, 3L)))
  }

  test("pipeline_length_buckets: ladder assignment, padding, and utilization on paper") {
    // word counts 5, 16, 17, 100 → buckets 16, 16, 32, 128
    val docs = docsDF(Seq(
      (1L, (1 to 5).map(_ => "w").mkString(" "), "en"),
      (2L, (1 to 16).map(_ => "w").mkString(" "), "en"),
      (3L, (1 to 17).map(_ => "w").mkString(" "), "en"),
      (4L, (1 to 100).map(_ => "w").mkString(" "), "en")))
    val out = CorpusOps.lengthBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (16L, 2L, 21L, 11L, 21L * 1000000L / 32L),
      (32L, 1L, 17L, 15L, 17L * 1000000L / 32L),
      (128L, 1L, 100L, 28L, 100L * 1000000L / 128L)))
  }

  test("retrieval_ndcg: self-hit at rank 1, ndcg bounded, perfect order iff ndcg_micro = 1e6") {
    val emb = Tables.embeddings(spark, sf())
    val ndcg = RetrievalOps.ndcgAtK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ndcg.nonEmpty)
    ndcg.foreach { case (p, dcg, idcg, nd) =>
      assert(dcg <= idcg, s"probe $p: dcg $dcg exceeds idcg $idcg")
      assert(nd >= 0 && nd <= 1000000, s"probe $p: ndcg_micro $nd out of range")
      // the probe is its own exact-rank-1 neighbor (cos = 1) and shares
      // every LSH band with itself, so rel k at ann rank 1 is
      // guaranteed: dcg ≥ k · w(1) = 10 · 10^6
      assert(dcg >= 10L * 1000000L, s"probe $p: self-hit contribution missing ($dcg)")
    }
    // driver-side recompute for one probe from the two retriever
    // outputs — an independent check of the join+weights arithmetic
    val exact = VectorOps.batchCosineTopK(emb).collect()
      .filter(_.getLong(0) == 0L).map(r => r.getLong(1) -> (10L - r.getInt(3) + 1))
      .toMap
    val ann = VectorOps.annLshBatch(emb).collect()
      .filter(_.getLong(0) == 0L).map(r => (r.getLong(1), r.getInt(3)))
    val w = RetrievalOps.ndcgDiscountMicro(10).toMap
    val handDcg = ann.map { case (v, rn) => exact.getOrElse(v, 0L) * w(rn) }.sum
    assert(ndcg.find(_._1 == 0L).get._2 === handDcg)
  }

  test("retrieval_mrr: every probe's first true neighbor is itself at rank 1") {
    val out = RetrievalOps.mrrAtK(Tables.embeddings(spark, sf())).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (p, fh, rr) =>
      assert(fh === 1L, s"probe $p: self-match must lead the ann list")
      assert(rr === 1000000L)
    }
  }

  test("join_bucketed_colocated: result equals the plain join; NO shuffle below the sort-merge join") {
    val customer = Tables.customer(spark, sf())
    val orders = Tables.orders(spark, sf())
    val bucketed = Joins.bucketedColocated(customer, orders)
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), Num.dsum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
    val got = bucketed.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val exp = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === exp.toSeq)
    // the bucketed layout must satisfy the join's distribution: zero
    // exchanges beneath the SMJ (the one exchange in the plan is the
    // aggregation above it). Under AQE (default in Spark 4.x) TreeNode
    // .collect can never see the SMJ: both the unexecuted
    // AdaptiveSparkPlanExec wrapper AND the materialized QueryStageExec
    // stages are LEAF nodes that hide their subtrees (this spec shipped
    // red in r12 for exactly that). Pin AQE off for the plan-shape half,
    // the PlanGuardSpec:344 device — the bucketed-scan property is
    // AQE-independent.
    val conf = spark.conf
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val exec = Joins.bucketedColocated(customer, orders)
        .queryExecution.executedPlan
      val smj = exec.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty, s"merge hint must yield a sort-merge join:\n$exec")
      val shufflesBelow = smj.head.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shufflesBelow.isEmpty,
        s"bucketed scan must satisfy the join distribution, found shuffle:\n${smj.head}")
    } finally conf.unset("spark.sql.adaptive.enabled")
  }
}
