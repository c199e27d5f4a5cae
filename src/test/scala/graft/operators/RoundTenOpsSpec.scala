package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Hand-computed semantic pins for the round-10 oracled wave. Each test
  * feeds a fixture small enough to verify on paper — the DuckDB oracle
  * proves cross-engine agreement at sf0.01; these prove the SEMANTICS
  * are the intended ones (an oracle can only confirm both engines run
  * the same query, not that the query computes the right thing).
  */
class RoundTenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("graph_triangles: one known triangle plus a pendant edge") {
    // orders: O1 ships parts {1,2,3} (a triangle), O2 ships {3,4} (an
    // edge). Degrees: 1→2, 2→2, 3→3, 4→1; wedges ΣC(d,2)=1+1+3+0=5;
    // triangles=1; clustering = 3·1e6·1/5 = 600000.
    val li = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 3L), (20L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val r = GraphOps.triangles(li).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (4L, 4L, 5L, 1L, 600000L))
  }

  test("graph_triangles: duplicate lineitem rows don't double-count edges") {
    // the same part twice in one order (two lineitems) must not create
    // a self-pair or duplicate edges
    val li = Seq((10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val r = GraphOps.triangles(li).collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(3) == 1L)
  }

  test("graph_degree_stats: hand-built bipartite degrees and shares") {
    // C1 buys from S1,S2; C2 buys from S1 → customer degrees {2,1},
    // supplier degrees {2,1}; each side has 3 endpoints
    val orders = Seq((100L, 1L), (200L, 2L)).toDF("o_orderkey", "o_custkey")
    val li = Seq((100L, 10L), (100L, 20L), (200L, 10L))
      .toDF("l_orderkey", "l_suppkey")
    val out = GraphOps.degreeStats(orders, li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("customer", 1L, 1L, 333333L), ("customer", 2L, 1L, 666666L),
      ("supplier", 1L, 1L, 333333L), ("supplier", 2L, 1L, 666666L)))
  }

  test("agg_percentiles_exact: values 1..10 pick rows 5, 9, 10") {
    val ev = (1 to 10).map(i => (i.toLong, "a", i.toDouble))
      .toDF("event_id", "event_type", "value")
    val r = Aggs.percentilesExact(ev).collect()(0)
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      == (10L, 5.0, 9.0, 10.0))
  }

  test("agg_percentiles_exact: tie values resolve by event_id, same element both ranks") {
    // n=4: p50 rank=2, p90 rank=4 (ceil(3.6)), p99 rank=4
    val ev = Seq((1L, "a", 7.0), (2L, "a", 7.0), (3L, "a", 7.0), (4L, "a", 9.0))
      .toDF("event_id", "event_type", "value")
    val r = Aggs.percentilesExact(ev).collect()(0)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4)) == (7.0, 9.0, 9.0))
  }

  test("ts_cross_corr: a series correlates perfectly with itself shifted by 2h") {
    // clicks are views shifted +2 hours: corr(lag=2) must be exactly 1
    // (identical integer operand dags both sides of the quotient);
    // corr(lag=0) on this pattern is strictly smaller
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(h: Int) = new java.sql.Timestamp(t0.getTime + h * 3600L * 1000L)
    val counts = Seq(1, 3, 1, 5, 2, 4) // varying → nonzero variance
    val views = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (h.toLong * 100 + i, at(h), "view")) }
    val clicks = counts.zipWithIndex.flatMap { case (c, h) =>
      (0 until c).map(i => (9000L + h * 100 + i, at(h + 2), "click")) }
    val ev = (views ++ clicks).toDF("event_id", "ts", "event_type")
    val out = StreamBatchOps.crossCorr(ev).collect()
      .filter(!_.isNullAt(2)) // zero-variance lags are NULL by contract
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(out(2) == 1.0, s"lag-2 corr should be exactly 1.0, got ${out(2)}")
    assert(out(0) < 1.0, "lag-0 corr must be below the shifted peak")
  }

  test("emb_covariance: 2-vector hand case, population covariance") {
    // vectors (1,2) and (3,4): means (2,3); cov = [[1,1],[1,1]]
    val emb = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val out = VectorOps.covariance(emb, dim = 2).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(out == Map((0, 0) -> 1.0, (0, 1) -> 1.0, (1, 1) -> 1.0))
  }

  test("emb_covariance agrees with dimStats variance on the diagonal") {
    val emb = Tables.embeddings(spark, sf())
    val cov = VectorOps.covariance(emb).filter(col("i") === col("j"))
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    val dv = VectorOps.dimStats(emb).collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(cov.keySet == dv.keySet)
    cov.foreach { case (d, v) =>
      assert(math.abs(v - dv(d)) <= 2e-6,
        s"dim $d: cov-diagonal $v vs dimStats variance ${dv(d)}")
    }
  }

  test("retrieval_recall_at_k equals the manual intersection of its two retrievers") {
    val emb = Tables.embeddings(spark, sf())
    val exact = VectorOps.batchCosineTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = VectorOps.annLshBatch(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val out = RetrievalOps.recallAtK(emb).collect()
    assert(out.map(_.getLong(0)).toSeq == (0L until 5L).toSeq)
    out.foreach { r =>
      val p = r.getLong(0)
      val hits = exact.filter(_._1 == p).count(ann.contains)
      assert(r.getLong(1) == 10L, "exact ground truth is top-10")
      assert(r.getLong(2) == hits.toLong, s"probe $p hit count")
      assert(r.getLong(3) == hits.toLong * 1000000L / 10L)
    }
    // the fixture's LSH recall is high but the assertion is structural:
    // recall_micro is bounded and consistent
    assert(out.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 1000000L))
  }
}
