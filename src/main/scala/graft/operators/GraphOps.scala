package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge sets. The near-dup clustering
  * family (DedupOps.clusters) already covers connected components; this
  * adds the other workhorse, PageRank — the centrality score behind
  * reference-weighted corpus curation (rank a source/domain graph by
  * citation structure and weight sampling by it — the Common Crawl
  * graph ranking recipe).
  */
object GraphOps {

  /** `graph_pagerank`: PageRank over the bipartite customer–supplier
    * purchase graph (an edge where a customer's order ships a
    * supplier's part), run for a FIXED `iters` power iterations with
    * damping 0.85 — the classic centrality measure, here in EXACT
    * INTEGER micro-units so two engines agree bit-for-bit:
    *
    *  - total rank mass is 10^12 micro-units, spread uniformly;
    *  - a node's per-neighbor contribution is `rank DIV degree`
    *    (integer floor — each division loses < 1 micro-unit, a
    *    documented ≤ degree·10^-12 mass leak per node per iteration,
    *    the price of order-free exactness);
    *  - update is `(10^12·15) DIV (100·N) + (85·Σcontrib) DIV 100` —
    *    the damped formula in integers (d = 0.85 exactly).
    *
    * Every aggregation sums BIGINTs (order-free), so the result is
    * partitioning-independent and the DuckDB oracle replays the
    * unrolled iterations verbatim.
    *
    * Scale shape: the edge list is built once (distinct pairs — one
    * shuffle), symmetrized, and lazy-pinned; each iteration is one
    * edge-keyed broadcast-free join (ranks are node-keyed, edges
    * src-keyed — co-partitioned after the first iteration's exchange)
    * plus one dst-keyed partial+final sum; the 1-row node count rides a
    * broadcast. Per-iteration cost is O(|E|) shuffle — PageRank's
    * inherent shape; `iters` bounds it. Top-N cut is a TakeOrdered. */
  def pagerank(orders: DataFrame, lineitem: DataFrame,
               iters: Int = 3, topN: Int = 20): DataFrame = {
    // node ids: customer → 2k, supplier → 2k+1 (key spaces overlap)
    val co = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // symmetrize with ONE pass over the distinct-pair subtree: explode
    // both directions per pair. The r9 unionAll form duplicated the
    // whole join+distinct subtree, so materializing the pin scanned
    // lineitem and orders TWICE (caught by the r10 scan-count guard);
    // cust ids are even / supp ids odd, so no reversed pair collides.
    val edges = graft.plans.PlanPins.lazyPin(
      co.select(explode(array(
          struct(col("a"), col("b")),
          struct(col("b").as("a"), col("a").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b")))
    val deg = graft.plans.PlanPins.lazyPin(
      edges.groupBy("a").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("a", "node"))
    val nRow = broadcast(deg.agg(count(lit(1)).as("n")))
    var ranks = deg.crossJoin(nRow)
      .select(col("node"), col("deg"), expr("1000000000000 DIV n").as("rank"))
    (1 to iters).foreach { _ =>
      val contrib = ranks.join(edges, col("node") === col("a"))
        .select(col("b"), expr("rank DIV deg").as("c"))
        .groupBy("b").agg(sum(col("c")).as("s"))
      ranks = deg.join(contrib, col("node") === col("b"), "left")
        .na.fill(0L, Seq("s"))
        .crossJoin(nRow)
        .select(col("node"), col("deg"),
          expr("(1000000000000 * 15) DIV (100 * n) + (85 * s) DIV 100")
            .as("rank"))
    }
    ranks
      .select(
        when(col("node") % 2 === 0, "customer").otherwise("supplier")
          .as("node_type"),
        expr("node DIV 2").as("key"), col("deg"),
        col("rank").as("rank_micro"))
      .orderBy(col("rank_micro").desc, col("node_type"), col("key"))
      .limit(topN)
  }
}
