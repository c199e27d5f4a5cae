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
