package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session-scoped, FILE-backed cache of the co-purchase projection —
  * the one corpus-sized stage all four graph queries
  * (bfs_depths / components / jaccard_links / triangles) rebuild
  * independently (~20-26 s EACH at sf10 for the identical edge list).
  * Conf-gated, DEFAULT ON since round 14 (`spark.graft.graph
  * .projectionCache`; the r13 verdict measured the family collapse
  * 162-217 s → 4.7-14.3 s at sf10 and made flipping the default the
  * round's top item): a session pays the projection build once per
  * (corpus, support) instead of once per query. Set the conf `false`
  * to opt out (the plan-shape specs do, to assert the uncached
  * two-scan shape); results are row-identical either way
  * (GraphProjectionCacheSpec's equivalence test).
  *
  * Mechanics (file-vs-persist rationale, keying, staleness guard,
  * build stamps) live in the r15-generalized
  * [[graft.plans.ProjectionCache]], which the dedup family's
  * verified-pairs tables share; this object is the graph-tagged,
  * graph-conf-gated facade the family and its specs address. */
private[operators] object GraphProjectionCache {
  private[operators] val ConfKey = "spark.graft.graph.projectionCache"

  private[operators] def entryCount: Int =
    graft.plans.ProjectionCache.entryCount

  private[operators] def entryCountFor(
      spark: org.apache.spark.sql.SparkSession): Int =
    graft.plans.ProjectionCache.entryCountFor(spark, "graph")

  def apply(pairs: DataFrame): DataFrame =
    graft.plans.ProjectionCache("graph", ConfKey, pairs)
}

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
    * inherent shape; `iters` bounds it. Top-N cut is a TakeOrdered.
    *
    * Iteration lineage: each loop layers `deg ⋈ contrib` over the
    * PREVIOUS ranks plan — unpinned, so the optimized plan for
    * iteration k contains k join/agg layers above the two pinned
    * leaves (edges, deg). Fine at iters=3 (plan depth ~12, both
    * corpus inputs still scanned once — guarded below); for iters
    * ≳ 10 pin the ranks each round or checkpoint every ~5 to keep
    * Catalyst's analysis cost linear. scan-guard: graph_pagerank */
  /** Shared customer–supplier bipartite projection: the distinct
    * (cust, supp) purchase pairs BOTH [[pagerank]] and [[degreeStats]]
    * rebuild from the same lineitem ⋈ orders join + distinct — the
    * corpus-sized stage of each (the same duplication the co-purchase
    * family had, r13 verdict #1). Routed through
    * [[GraphProjectionCache]] (DEFAULT ON): the second consumer in a
    * session scans the 16-byte pair parquet instead of re-joining the
    * corpus. The two-scan claims are asserted conf-off, like the
    * co-purchase consumers. */
  private[operators] def custSuppEdges(orders: DataFrame,
                                       lineitem: DataFrame): DataFrame = {
    val pairs = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    GraphProjectionCache(pairs)
  }

  def pagerank(orders: DataFrame, lineitem: DataFrame,
               iters: Int = 3, topN: Int = 20): DataFrame = {
    // node ids: customer → 2k, supplier → 2k+1 (key spaces overlap).
    // Pin the DIRECTED pairs (r14: half the rows of the old symmetrized
    // pin — the explode is re-run lazily per consumer above the pin,
    // which is cheap, while the pin write is not; with the projection
    // cache ON the pin sits over a 16-byte-pair parquet scan).
    val co = graft.plans.PlanPins.lazyPin(
      custSuppEdges(orders, lineitem)
        .select((col("cust") * 2).as("a"), (col("supp") * 2 + 1).as("b")))
    // symmetrize with ONE pass over the distinct-pair subtree: explode
    // both directions per pair. The r9 unionAll form duplicated the
    // whole join+distinct subtree, so materializing the pin scanned
    // lineitem and orders TWICE (caught by the r10 scan-count guard);
    // cust ids are even / supp ids odd, so no reversed pair collides.
    // The iteration joins consume this through ONE exchange that AQE
    // reuses across iterations (ReusedExchange).
    val edges0 = co.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    // r16 experiment (VERDICT r15 #5): optionally materialize the
    // SYMMETRIZED 16-byte pairs once per session (ProjectionCache) so
    // each iteration scans a flat parquet instead of re-running the
    // explode above the directed pin. Measured at sf10 solo
    // (docs/BENCH_NOTES.md round-16): on the r16 memory-starved host
    // ON is reliably faster (331-337 s vs 475-508 s cold) BECAUSE the
    // parquet scan replaces the explode's in-memory row fan and the
    // smaller heap footprint dodges the host's 0.05 GB/s first-touch
    // tax; on a normally-backed box the explode-over-pin form carried
    // r15's 49 s in-suite number and the cache only adds a ~2 GB
    // build write. DEFAULT OFF (the healthy-box choice, and the
    // committed sf0.1 contract's plan); the knob is the deployment
    // lever — on a real cluster a shared-FS edge artifact also buys
    // MULTI-SESSION reuse, which no block cache covers.
    val edges =
      if (orders.sparkSession.conf
          .get("spark.graft.graph.symEdgesCache", "false").toBoolean)
        graft.plans.ProjectionCache(
          "gsym", "spark.graft.graph.symEdgesCache", edges0)
      else edges0
    val deg = graft.plans.PlanPins.lazyPin(
      edges.groupBy("a").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("a", "node"))
    val nRow = broadcast(deg.agg(count(lit(1)).as("n")))
    var ranks = deg.crossJoin(nRow)
      .select(col("node"), col("deg"), expr("1000000000000 DIV n").as("rank"))
    (1 to iters).foreach { _ =>
      // SHUFFLE_HASH on the O(nodes) ranks side (r14): the planner's
      // default SortMergeJoin re-SORTED the O(|E|) edge rows every
      // iteration (the exchange is reused across iterations, the sort
      // is not — measured ~9 s/iteration at sf10); ranks exceed the
      // broadcast threshold but hash-build per partition is tiny
      // (|nodes|/partitions rows), and a hash join never sorts the
      // edge stream. Scale-safe where broadcast(ranks) is not: the
      // build side stays O(nodes/partitions) at any graph size.
      val contrib = ranks.hint("shuffle_hash")
        .join(edges, col("node") === col("a"))
        .select(col("b"), expr("rank DIV deg").as("c"))
        .groupBy("b").agg(sum(col("c")).as("s"))
      ranks = deg.hint("shuffle_hash")
        .join(contrib, col("node") === col("b"), "left")
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

  /** `graph_degree_stats`: degree distribution of the bipartite
    * customer–supplier purchase graph — the first diagnostic run on ANY
    * graph before ranking/clustering it (a power-law tail says "salt
    * the hubs"; a spiked histogram says the generator is degenerate).
    * Emits one row per (node_type, degree): how many nodes have that
    * degree, plus each bucket's share of its side's edge endpoints in
    * exact integer micro-units (bucket_nodes·degree·10^6 DIV side_sum).
    *
    * Scale shape: the distinct-edge shuffle is the same one pagerank
    * pays (16-byte pairs); both endpoints of each pair are emitted in
    * ONE pass over the distinct-pair subtree (the pagerank explode
    * device — a unionAll would duplicate the join+distinct subtree and
    * re-scan the corpus per side, the r10-judge-measured 5+5-scan
    * defect); degrees are one partial+final count per side; the
    * histogram collapses to O(distinct degrees) rows map-side and is
    * lazy-pinned (two consumers: the output rows and the side totals);
    * side totals re-attach by a 2-row broadcast. Guarded by
    * PlanGuardSpec's scan-count map (1 lineitem + 1 orders scan).
    *
    * scan-guard: graph_degree_stats */
  def degreeStats(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val co = custSuppEdges(orders, lineitem)
    val deg = co.select(explode(array(
        struct(lit("customer").as("node_type"), col("cust").as("node")),
        struct(lit("supplier").as("node_type"), col("supp").as("node"))))
        .as("e"))
      .select(col("e.node_type").as("node_type"), col("e.node").as("node"))
      .groupBy("node_type", "node").agg(count(lit(1)).as("degree"))
    val hist = graft.plans.PlanPins.lazyPin(
      deg.groupBy("node_type", "degree")
        .agg(count(lit(1)).as("n_nodes")))
    val sideTotal = hist.groupBy("node_type")
      .agg(sum(col("degree") * col("n_nodes")).as("side_endpoints"))
    hist.join(broadcast(sideTotal), Seq("node_type"))
      .select(col("node_type"), col("degree"), col("n_nodes"),
        expr("degree * n_nodes * 1000000 DIV side_endpoints")
          .as("endpoint_share_micro"))
      .orderBy("node_type", "degree")
  }

  /** `graph_hits` (r15): Kleinberg HITS hubs & authorities over the
    * DIRECTED bipartite purchase graph (customer → supplier) — the
    * two-sided centrality PageRank can't give: a hub is a customer
    * whose purchases concentrate on authoritative suppliers, an
    * authority a supplier bought by strong hubs (the query/document
    * duality that seeded modern retrieval; for corpus curation it is
    * the crawler/host two-sided trust shape). Fixed `iters` mutual
    * iterations in EXACT INTEGER micro-units so both engines agree
    * bit-for-bit:
    *
    *  - hubs start at 10^6;
    *  - auth_raw(s) = Σ_{c→s} hub(c), then L∞ normalization
    *    `auth = auth_raw·10^6 DIV max(auth_raw)` (any norm converges;
    *    the max keeps every intermediate ≤ 10^16 — overflow-free BIGINT
    *    where an L1/10^12 rescale would overflow, and the max itself is
    *    order-free);
    *  - hub_raw(c) = Σ_{c→s} auth(s), same normalization.
    *
    * Output: the top `topN` per side, ('authority'|'hub', key,
    * score_micro), score ≤ 10^6 with the side's max pinned at exactly
    * 10^6. The DuckDB oracle replays the unrolled iterations verbatim
    * (the graph_pagerank device).
    *
    * Scale shape: rides the SAME cached bipartite projection as
    * pagerank/degree_stats ([[custSuppEdges]] — with the cache ON the
    * second consumer scans 16-byte pairs); each half-step is one
    * edge-keyed join + one partial+final sum + a 1-row broadcast max;
    * per-iteration cost is 2×O(|E|) shuffle, HITS' inherent shape.
    * Directed pairs join AS IS — no symmetrizing explode, half
    * pagerank's per-iteration edge rows. Top-N cuts are TakeOrdered.
    * scan-guard: exempt (the eager loop materializes the projection and
    * every half-step behind pins + 1-row driver collects at
    * construction — the components/bfs device — so the returned plan
    * executes zero direct corpus scans; the projection's single-scan
    * claim is guarded by graph_triangles / RoundElevenOpsSpec) */
  /** OWNERSHIP: the returned frame scans the final iteration's two
    * pinned score tables — release with
    * `ColumnBridge.releaseAllCheckpoints(result)` once rows are
    * consumed (the Bench/Verify harnesses do this per run); every
    * superseded half-step pin and the edge pin are released inside the
    * loop, the clusters-loop hygiene. */
  def hits(orders: DataFrame, lineitem: DataFrame,
           iters: Int = 2, topN: Int = 10): DataFrame = {
    require(iters >= 1, "hits needs at least one iteration")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // UNPINNED edges (unlike pagerank's `co` pin): with the projection
    // cache ON this is a 16-byte-pair parquet scan, and re-scanning it
    // once per half-step is cheaper than copying 58M rows into block
    // storage first (the pin write was ~a quarter of the eager loop)
    val edges = custSuppEdges(orders, lineitem)
    var hub = edges.select(col("cust")).distinct()
      .select(col("cust"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    // EAGER loop (r15 rework): the first cut normalized through a
    // max-agg crossJoin over the UNPINNED raw table, so every half-step
    // was consumed twice (the max branch + the normalize branch) and
    // the 58M-row edge join re-executed up the whole iteration lineage
    // — 99 s solo at sf10 for work worth ~45. Each half-step now PINS
    // its O(nodes) raw table, collects the 1-row max to the driver (the
    // BPE/KMeans driver-iteration pattern — materializing the pin), and
    // normalizes as a projection OVER the pin; superseded pins release
    // immediately (the DedupOps.clusters loop hygiene).
    var lastAuthPin: DataFrame = null
    var lastHubPin: DataFrame = null
    def halfStep(scores: DataFrame, joinKey: String, outKey: String,
                 scoreCol: String, outCol: String): (DataFrame, DataFrame) = {
      val raw = graft.plans.PlanPins.lazyPin(
        scores.hint("shuffle_hash")
          .join(edges, Seq(joinKey))
          .groupBy(outKey).agg(sum(col(scoreCol)).as("raw")))
      val mxRow = raw.agg(max(col("raw"))).head()
      val mx = if (mxRow.isNullAt(0)) 1L else mxRow.getLong(0)
      (raw, raw.select(col(outKey), expr(s"raw * 1000000 DIV ${mx}L").as(outCol)))
    }
    (1 to iters).foreach { _ =>
      val (aPin, a) = halfStep(hub, "cust", "supp", "h", "a")
      if (lastAuthPin != null) ColumnBridge.releaseCheckpoint(lastAuthPin)
      lastAuthPin = aPin
      auth = a
      val (hPin, h) = halfStep(auth, "supp", "cust", "a", "h")
      if (lastHubPin != null) ColumnBridge.releaseCheckpoint(lastHubPin)
      lastHubPin = hPin
      hub = h
    }
    val topAuth = auth
      .select(lit("authority").as("node_type"), col("supp").as("key"),
        col("a").as("score_micro"))
      .orderBy(col("score_micro").desc, col("key")).limit(topN)
    val topHub = hub
      .select(lit("hub").as("node_type"), col("cust").as("key"),
        col("h").as("score_micro"))
      .orderBy(col("score_micro").desc, col("key")).limit(topN)
    topAuth.unionAll(topHub)
      .orderBy(col("node_type"), col("score_micro").desc, col("key"))
  }

  /** `graph_triangles`: global triangle census of the part CO-PURCHASE
    * graph — the market-basket projection with the standard SUPPORT
    * threshold (an edge when two parts ship together in ≥ `minSupport`
    * distinct orders, the Apriori association rule-of-thumb);
    * triangles/wedges give the global clustering coefficient, the
    * standard cohesion measure. The threshold is what keeps the
    * projection analyzable at ANY scale: the unthresholded one-mode
    * projection densifies with data (measured: 148M wedges at sf0.1,
    * and the supplier variant saturates COMPLETE — clustering 1.0,
    * Θ(n³) wedges), while random once-only co-occurrences are exactly
    * what support ≥ 2 removes — the surviving graph tracks genuine
    * association, stays sparse (3.4k edges at sf0.01, 3.6k at sf0.1),
    * and the census cost collapses onto the one linear pair-support
    * aggregation. Output is ONE row: nodes, edges, wedges, triangles,
    * and 3·triangles·10^6 DIV wedges.
    *
    * Scale shape — the degree-ORDERED orientation (the classic
    * distributed-triangle trick, e.g. Suri & Vassilvitskii 2011's MR
    * algorithm): orient every edge from the (degree, id)-smaller
    * endpoint to the larger, so each node's OUT-degree is bounded by
    * ~sqrt(|E|) regardless of how big a hub it is; wedges are then
    * out×out pairs at the center (never a hub's full neighborhood
    * squared), and each triangle is counted exactly once by its
    * smallest vertex. Pair generation per order is bounded by
    * (lineitems-per-order choose 2) — order fan-out, not supplier
    * fan-out. The closing-edge check is one equi semi-join of wedge
    * endpoints against the oriented edge list. The corpus is scanned
    * exactly ONCE (the basket aggregate, while materializing the
    * pinned edge list) — PlanGuardSpec asserts it.
    *
    * scan-guard: graph_triangles */
  /** Shared co-purchase projection: part pairs sharing an order
    * (a < b canonical), kept only at support >= `minSupport` distinct
    * orders. Returned UNPINNED: [[triangles]] lazy-pins it
    * (five consumers), [[components]] hands it to DedupOps.clusters,
    * which persists the pair table itself. With
    * [[GraphProjectionCache]] enabled (conf-gated, DEFAULT ON) the
    * returned frame scans the session's cached parquet copy instead —
    * same rows, zero corpus scans after the first build; the one-scan
    * claims below are asserted with the conf pinned off.
    *
    * Build shape (r15 — the sf10 family's remaining cost was this
    * build, paid by whichever query runs first): ONE corpus scan into a
    * per-order basket aggregate (`collect_set`, bounded by
    * lineitems-per-order ≤ 8 — TPC-H order fan, not supplier fan; the
    * set ALSO dedupes repeated parts within an order, preserving the
    * "distinct orders" support semantics), then a compiled a<b pair fan
    * over each sorted basket, then ONE plain-count pair aggregation.
    * The r6-r14 self-join form paid the same pair fan PLUS a hash-join
    * probe over the corpus PLUS `countDistinct`'s two-phase Expand —
    * i.e. two extra corpus-fan shuffles for identical rows (a pair
    * appears at most once per order either way, so count == distinct
    * count). Measured sf10 (solo, autosized): the build front-runner
    * graph_bfs_depths 83.8 → 33.3 s, of which the stamped projection
    * build is 32.5 s.
    *
    * scan-guard: graph_triangles (the pinned consumers assert the
    * single lineitem scan; components/bfs assert it on the pair plan
    * in RoundElevenOpsSpec) */
  /** The a<b pair fan, hoisted to a STATIC whole-iterator function: a
    * fresh lambda per call would make each construction's MapPartitions
    * node compare unequal (closures have no value equality), changing
    * the plan's semanticHash and so the [[GraphProjectionCache]] key —
    * the cache would rebuild per query instead of per session
    * (GraphProjectionCacheSpec's one-entry test caught exactly this).
    * `mapPartitions`, not `flatMap`: Dataset.flatMap wraps the func in
    * a fresh `_.flatMap(f)` closure internally, defeating the hoist. */
  // defined via pairSupport (ADVICE r16: the two build pipelines were
  // verbatim copies and could drift) — same plan tree as before, so the
  // GraphProjectionCache semanticHash key is unaffected
  private[operators] def coPurchaseEdges(lineitem: DataFrame,
                                         minSupport: Int): DataFrame =
    GraphProjectionCache(
      pairSupport(lineitem)
        .filter(col("support") >= minSupport)
        .select("a", "b"))

  /** UNthresholded co-purchase pair support over a lineitem slice —
    * the maintainable STATE form of [[coPurchaseEdges]]'s projection:
    * one row per canonical (a < b) part pair with the number of
    * distinct orders containing both. Same build shape as the cached
    * projection (one order-clustered sort-walk pair fan, one pair
    * count — within-basket duplicates dedupe inline on the sorted
    * adjacency, so count == distinct-order count); the threshold is NOT
    * applied here because a pair below `minSupport` today can cross it
    * after an append — the maintained state must keep every pair. */
  private[graft] def pairSupport(lineitem: DataFrame): DataFrame = {
    // r19 (optimization round; third rework, each event-log-measured
    // at sf10 — history: r13-r17 collect_set ObjectHashAggregate whose
    // sort-based fallback re-sorted serialized buffers; a typed
    // sorted-walk that paid ~11 µs/pair in boxing; r18's codegen
    // basket self-join over one reused exchange). The r18 form still
    // cost 121-190 s at sf10 because the generator makes pair support
    // ULTRA-SPARSE — 157.52M of 157.53M (a, b) pairs are unique — so
    // every hash aggregate in the plan achieved no reduction and only
    // paid hash-map costs, and the self-join re-ran the 67.4M-key
    // dedup FINAL aggregate + an (ok) sort once PER SIDE above the
    // reused exchange (PairDiag: dedup+fan alone 121.6 s).
    //
    // The shipped form is ONE streaming pipeline over one exchange —
    // no hash aggregate touches corpus-sized keys before the final
    // count, and nothing runs twice:
    //   repartition(ok) → in-partition sort (ok, pk) → lag-filter
    //   dedup (streaming, replaces the 67.4M-key distinct agg) →
    //   collect_list window builds each basket's SORTED distinct-part
    //   array (row_number()=1 keeps one row per order; baskets are
    //   O(order size), so the buffered frame is tiny) → a < b pairs
    //   fan POSITIONALLY from the sorted array (posexplode × sliced
    //   explode — generated code, no join, no second pipeline) → one
    //   (a, b) count whose partial maps are fed clustered,
    //   basket-adjacent keys.
    // PairDiag at sf10 (32 cores, autosized): 121.3 s → 13.8 s warm,
    // 190 s → ~20 s cold, identical rows (row-count + support≥2
    // cross-check stamped in the diag log, oracle hash unchanged).
    // The count stays groupBy (hash agg) — the sort-window count
    // variant measured 2× slower (28.6 s) because sorting 157M pair
    // rows costs more than upserting them into well-fed maps.
    // NOT pinned: a pin's LogicalRDD leaf has per-instance identity,
    // which would break ProjectionCache keying (every consumer would
    // rebuild). scan-guard: pairSupport — ONE static FileScan now
    // (the consumers' claims dropped from 2 back to 1 this round).
    val wOk = Window.partitionBy("ok").orderBy("pk")
    val wOkFull = wOk.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val basket = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(col("ok"))
      .sortWithinPartitions("ok", "pk")
      .withColumn("prev", lag(col("pk"), 1).over(wOk))
      .filter(col("prev").isNull || col("prev") =!= col("pk"))
    val arrs = basket
      .withColumn("arr", collect_list(col("pk")).over(wOkFull))
      .withColumn("rn", row_number().over(wOk))
      .filter(col("rn") === 1)
      .select(col("arr"))
    arrs
      .select(posexplode(col("arr")).as(Seq("i", "a")), col("arr"))
      .select(col("a"),
        explode(slice(col("arr"), col("i") + lit(2),
          size(col("arr")) - col("i") - lit(1))).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
  }

  /** One maintenance step: merge a delta's pair support into the
    * state. Pair support is ADDITIVE over disjoint order sets (an
    * order's basket contributes its pairs exactly once, to exactly the
    * batch that carries it), so for WHOLE-ORDER appends
    * `merge(state(L₀), delta(L₁)) == pairSupport(L₀ ∪ L₁)` exactly —
    * the append ≡ rebuild contract ([[graft.streaming
    * .ProjectionMaintenance]] proves it under bus replay; the
    * `graph_copurchase_incr` oracle hash-proves it vs a DuckDB full
    * rebuild). One shuffle on (a, b) of O(|state| + |delta|) rows per
    * step — the lakehouse MERGE INTO shape: at 100 TB the state is a
    * sunk pair table and each append pays only this merge, never the
    * historical corpus scan a rebuild would. */
  private[graft] def mergePairSupport(state: DataFrame,
                                      delta: DataFrame): DataFrame =
    state.unionAll(delta)
      .groupBy("a", "b").agg(sum(col("support")).as("support"))

  /** `graph_copurchase_incr`: the co-purchase projection built by
    * INCREMENTAL MAINTENANCE instead of one rebuild — the corpus
    * arrives as `nBatches` whole-order appends (order o rides batch
    * `o_orderkey % nBatches`; an order's lineitems always share the
    * key, so the whole-order granularity the additivity argument needs
    * holds by construction) and each batch folds into the running
    * state. The DRIVER ORACLE is the full rebuild (DuckDB self-join
    * pair support over all of lineitem), so the gate's hash match IS
    * the append ≡ rebuild proof at sf0.01. Cost shape: nBatches basket
    * aggregates (each over its slice) + ONE flattened merge — support
    * is additive, so the [[mergePairSupport]] fold chain is a
    * sum-of-sums the optimizer collapses anyway (r19: written
    * explicitly after the stage-split probe showed the chain executes
    * as one union+agg stage; the PER-STEP merge cost a deployment pays
    * lives at the streaming twin, which materializes state between
    * folds). The replay's nBatches slice scans are pinned by the
    * scan-count guard (VERDICT r16 #3) so the fold cost can't silently
    * double; per-batch merge row/duration stamps live at the twin
    * ([[graft.streaming.ProjectionMaintenance]]'s applyBatch, where the
    * merged version is already materialized and the count is a parquet-
    * footer read) — stamping the lazy fold here would re-execute each
    * corpus-sized level once more per stamp.
    * scan-guard: graph_copurchase_incr */
  def coPurchaseIncremental(lineitem: DataFrame, nBatches: Int = 4,
                            minSupport: Int = 2): DataFrame = {
    val batches = (0 until nBatches).map(b =>
      pairSupport(lineitem.filter(
        pmod(col("l_orderkey"), lit(nBatches)) === b)))
    // r19 (the sf10 stage-split adjudication, VERDICT r18 #2): the
    // reduceLeft merge chain flattens into ONE union + sum-of-sums
    // stage, and because every branch ends in an identical
    // hashpartitioning(a, b, P) exchange, the planner ZIPS the branch
    // shuffles (co-partitioned union) and runs the merge aggregate
    // with NO exchange of its own — one stage holding nBatches branch
    // count-agg hash maps PLUS the merge's partial+final maps. At sf10
    // the probe measured that stage at 8 tasks / 30+ GB spill / 388 s:
    // ~6 concurrent corpus-pair hash maps per task. The explicit
    // 2·P repartition re-introduces an honest merge exchange (an
    // exact-P spec is elided as a no-op against the zip partitioning —
    // measured, not guessed), splits the stage so branch maps and
    // merge maps never coexist, and AQE never coalesces
    // REPARTITION_BY_NUM.
    val shuffleP = lineitem.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    batches.reduceLeft(_.unionAll(_))
      .repartition(2 * shuffleP, col("a"), col("b"))
      .groupBy("a", "b").agg(sum(col("support")).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("a"), col("b"), col("support").cast("long").as("support"))
      .orderBy("a", "b")
  }

  def triangles(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    // lazy-pinned: the thresholded edge list is TINY (3.6k rows at
    // sf0.1) but its subtree is the corpus-sized basket fan — unpinned,
    // its five consumers (deg's two union sides, the two orientation
    // joins, nEdges via oriented) re-ran it per branch: the r10 judge
    // measured 10 lineitem FileScans. Pinning caps the census at the
    // build's honest 1 scan, guarded in PlanGuardSpec.
    val edges = graft.plans.PlanPins.lazyPin(
      coPurchaseEdges(lineitem, minSupport))
    // deg is also multi-consumer (two orientation joins + nWedges +
    // nNodes) — pinned too; both pins are O(|E|) post-aggregation rows
    val deg = graft.plans.PlanPins.lazyPin(
      edges.select(col("a").as("n"))
        .unionAll(edges.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d")))
    // orient by (degree, id): lower endpoint -> higher endpoint
    val withDeg = edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
    val oriented = graft.plans.PlanPins.lazyPin(withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("b"))
        .otherwise(col("a")).as("v")))
    // wedge COUNT needs no wedge materialization: Σ_v C(deg_v, 2) over
    // the UNDIRECTED degrees (the standard denominator of the global
    // clustering coefficient — the oriented out-out pairs below are the
    // triangle-search space, not the wedge census)
    val nWedges = deg
      .select(coalesce(sum(expr("d * (d - 1) DIV 2")), lit(0L))
        .as("n_wedges"))
    // wedges at u: (v, w) out-pairs; the closing edge may be oriented
    // either way, so probe the UNDIRECTED canonical pair against the
    // canonicalized oriented edge list
    val wedges = oriented.select(col("u"), col("v"))
      .join(oriented.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    val canon = oriented.select(
      least(col("u"), col("v")).as("v"), greatest(col("u"), col("v")).as("w"))
    val tri = wedges.join(canon, Seq("v", "w"), "left_semi")
    val nNodes = deg.select(count(lit(1)).as("n_nodes"))
    // counted from the EDGES pin (orientation is 1:1, same count):
    // keeps the chained pin reachable from the final plan, which both
    // the scan-count guard and releaseAllCheckpoints' walk require
    val nEdges = edges.select(count(lit(1)).as("n_edges"))
    val nTri = tri.select(count(lit(1)).as("n_triangles"))
    nNodes.crossJoin(broadcast(nEdges)).crossJoin(broadcast(nWedges))
      .crossJoin(broadcast(nTri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        expr("3 * n_triangles * 1000000 DIV greatest(n_wedges, 1)")
          .as("clustering_micro"))
  }

  /** `graph_jaccard_links`: neighborhood-Jaccard link prediction over
    * the support-thresholded co-purchase graph — the classic
    * "customers who bought X also bought Y" candidate generator: rank
    * NON-adjacent part pairs by |N(u)∩N(v)| / |N(u)∪N(v)| and surface
    * the top `topK` as predicted links. Jaccard in integer micro-units
    * (inter·10⁶ DIV (du + dv − inter)); ties break on (a, b), so the
    * cut is deterministic.
    *
    * Scale shape: the corpus-sized stage is the shared
    * [[coPurchaseEdges]] projection (one basket-aggregate scan,
    * lazy-pinned — four consumers: wedge join's two sides, the degree
    * union, the adjacency anti-join); everything after runs on the
    * O(|E|) edge table — candidate pairs come from the wedge join
    * (common-neighbor pairs only, never all-pairs), degrees re-attach
    * by broadcast, existing edges drop via one anti-join, and the
    * top-k cut is a TakeOrdered. scan-guard: graph_jaccard_links */
  def jaccardLinks(lineitem: DataFrame, minSupport: Int = 2,
                   topK: Int = 50): DataFrame = {
    val edges = graft.plans.PlanPins.lazyPin(
      coPurchaseEdges(lineitem, minSupport))
    // symmetrized adjacency in ONE pass over the pin (the pagerank
    // explode device)
    val adj = edges.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("d"))
    // candidate pairs share >= 1 neighbor: wedge join at the common
    // neighbor v — bounded by sum over v of C(deg_v, 2), the wedge
    // count the triangle census already measures as sparse here
    val cand = adj.select(col("v").as("n"), col("u").as("a"))
      .join(adj.select(col("v").as("n"), col("u").as("b")), Seq("n"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    val nonEdge = cand.join(edges, Seq("a", "b"), "left_anti")
    nonEdge
      .join(broadcast(deg.select(col("u").as("a"), col("d").as("da"))),
        Seq("a"))
      .join(broadcast(deg.select(col("u").as("b"), col("d").as("db"))),
        Seq("b"))
      .select(col("a"), col("b"), col("inter"), col("da"), col("db"),
        expr("inter * 1000000 DIV (da + db - inter)").as("jaccard_micro"))
      .orderBy(col("jaccard_micro").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** `graph_components`: connected components of the part co-purchase
    * graph ([[coPurchaseEdges]], the [[triangles]] projection) — the
    * community census that turns an association graph into product
    * families, and the same primitive the dedup family uses for
    * duplicate groups. Emits the component-SIZE distribution — one row
    * per distinct size with the component count and the smallest
    * component label of that size — which stays O(distinct sizes) at
    * any graph scale (a per-component listing would be corpus-sized).
    *
    * Component labels are min-reachable-node ids (DedupOps.clusters'
    * pointer-jump contract), so the DuckDB oracle can replay them with
    * a recursive reachability CTE; every count is integer-exact.
    *
    * Scale shape — TWO tiers keyed on the measured edge count. The one
    * corpus-sized stage (the projection's single basket scan —
    * RoundElevenOpsSpec asserts the shape) executes ONCE, collected
    * through a limit(max+1) that bounds driver memory to ~16 B·max
    * whatever the graph turns out to be:
    *
    *  - |E| ≤ `maxDriverEdges` (the NORMAL case — the support threshold
    *    keeps this projection sparse by construction: 3.4k edges at
    *    sf0.01, 3.6k at sf10): collect the THRESHOLDED edges and run
    *    driver union-find with min-label roots — the Skew
    *    boundary-collect pattern (O(small) rows to the driver, never
    *    the corpus). The pointer-jump loop's per-round fixed cost
    *    (8 rounds × ~1 s of job scheduling at any size) is machinery
    *    for 10⁸-edge dedup graphs, not a 10³-edge association graph —
    *    measured 13.3 s loop-tier vs ~2 s driver-tier at sf0.1 on the
    *    IDENTICAL graph.
    *  - |E| > `maxDriverEdges`: the audited DedupOps.clusters
    *    pointer-jump CC (delta-frontier over checkpointed partitions,
    *    O(log diameter) rounds — sf10-measured on the dedup graphs),
    *    converging to the SAME min-reachable labels (the spec pins
    *    tier equivalence by forcing `maxDriverEdges = 0`); this rare
    *    path re-executes the projection inside clusters' persist — one
    *    extra pass, paid only when the loop tier is the right call.
    *
    * The size histogram is two tiny aggregations over the label table.
    *
    * OWNERSHIP (clusters tier only): the returned frame scans clusters'
    * label checkpoint — the caller releases it via
    * ColumnBridge.releaseAllCheckpoints once rows are consumed (the
    * Bench/Verify harnesses do this per run).
    *
    * scan-guard: exempt (the pair table materializes behind a persist
    * the pin-origin walk cannot attribute; the 2-scan claim is
    * asserted on the pair plan in RoundElevenOpsSpec) */
  def components(lineitem: DataFrame, minSupport: Int = 2,
                 maxDriverEdges: Int = 2000000): DataFrame = {
    val spark = lineitem.sparkSession
    val pairs = coPurchaseEdges(lineitem, minSupport)
    // ONE execution decides the tier AND (in the normal case) delivers
    // the edges: collect through limit(max+1) bounds driver memory to
    // ~16 B·max whatever the graph turns out to be. The rare big-graph
    // path re-executes the projection inside clusters' own persist —
    // one extra pass, paid only when the loop tier is the right call
    // anyway.
    val probe = pairs.limit(maxDriverEdges + 1).collect()
    val labels =
      if (probe.length <= maxDriverEdges) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
          r
        }
        probe.foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          // min-label union: the root is always the smaller id, so the
          // final find() IS the min reachable node — clusters' contract
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val out = parent.keys.toSeq.map(n => (n, find(n)))
        import spark.implicits._
        out.toDF("doc_id", "cluster")
      } else
        DedupOps.clusters(
          pairs.select(col("a").as("id_a"), col("b").as("id_b")))
    labels
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_nodes"))
      .groupBy(col("n_nodes"))
      .agg(count(lit(1)).as("n_components"),
        min(col("cluster")).as("min_component"))
      .orderBy("n_nodes")
  }

  /** `graph_bfs_depths` (round 13): multi-source BFS hop distances over
    * the part co-purchase graph ([[coPurchaseEdges]], the
    * [[components]] projection) — the reachability PROFILE a component
    * census can't give: how far the graph extends from a seed set
    * (here: the `nSeeds` smallest node ids — deterministic), which is
    * the primitive behind crawl-frontier depth budgeting, influence
    * radius, and "how many hops from trusted seeds is this domain"
    * corpus weighting (the TrustRank shape). Emits the depth HISTOGRAM
    * (depth → node count + smallest node at that depth), O(diameter)
    * rows at any graph size; unreached nodes (disconnected, or beyond
    * `maxDepth`) land in the depth = -1 row. Both engines cap the walk
    * at the same `maxDepth`, making the cap part of the semantics.
    *
    * Scale shape — the [[components]] two-tier device, same probe and
    * rationale. The corpus-sized projection executes ONCE through a
    * limit(max+1)-bounded collect:
    *
    *  - |E| ≤ `maxDriverEdges` (the normal case — the support
    *    threshold keeps the projection at 10³-10⁴ edges across SFs):
    *    driver BFS over the collected adjacency — O(|V|+|E|), no
    *    per-round job-scheduling overhead.
    *  - |E| > `maxDriverEdges`: distributed frontier expansion — each
    *    round is ONE edge⋈frontier equi-join (src-keyed, co-partitioned
    *    after round 1) plus an anti-join against the visited set; the
    *    frontier only ever holds (node, depth) pairs, never corpus
    *    rows, and O(log …) is bounded by min(diameter, maxDepth)
    *    rounds. Frontier/visited persist per round and unpersist on
    *    exit (the pagerank iteration-lineage note: depth > ~10 would
    *    want checkpoints; maxDepth rounds stay shallow because each
    *    round's plan builds on a MATERIALIZED persist, not lineage).
    *
    * scan-guard: exempt (the projection materializes behind the probe
    * collect / per-round persists the pin-origin walk cannot attribute;
    * the 1-scan claim is asserted on the pair plan in
    * RoundElevenOpsSpec for the shared projection) */
  def bfsDepths(lineitem: DataFrame, minSupport: Int = 2, nSeeds: Int = 8,
                maxDepth: Int = 32, maxDriverEdges: Int = 2000000): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val pairs = coPurchaseEdges(lineitem, minSupport)
    val probe = pairs.limit(maxDriverEdges + 1).collect()
    val depths: DataFrame =
      if (probe.length <= maxDriverEdges) {
        val adj = scala.collection.mutable.Map
          .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
        probe.foreach { row =>
          val (a, b) = (row.getLong(0), row.getLong(1))
          adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
          adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
        }
        val seeds = adj.keys.toSeq.sorted.take(nSeeds)
        val depth = scala.collection.mutable.Map.empty[Long, Int]
        seeds.foreach(s => depth(s) = 0)
        var frontier = seeds
        var d = 0
        while (frontier.nonEmpty && d < maxDepth) {
          d += 1
          frontier = frontier.flatMap(adj(_))
            .filter(n => !depth.contains(n)).distinct
          frontier.foreach(n => depth(n) = d)
        }
        adj.keys.toSeq.map(n => (n, depth.getOrElse(n, -1).toLong))
          .toDF("node", "depth")
      } else {
        // distributed tier: frontier expansion over the symmetrized
        // edge table; every intermediate is O(frontier), never corpus
        val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
          .persist()
        val nodes = edges.select(col("src").as("node")).distinct().persist()
        val seeds = nodes.orderBy("node").limit(nSeeds)
          .withColumn("depth", lit(0L))
        var visited = seeds.persist()
        var frontier = seeds
        var d = 0L
        var frontierSize = frontier.count()
        while (frontierSize > 0 && d < maxDepth) {
          d += 1
          val next = edges
            .join(frontier.select(col("node").as("src")), Seq("src"))
            .select(col("dst").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti")
            .withColumn("depth", lit(d)).persist()
          frontierSize = next.count()
          val grown = visited.unionAll(next).persist()
          grown.count()
          visited.unpersist()
          // release the PREVIOUS round's frontier now that `next` and
          // `grown` are materialized — without this every round's small
          // cached frontier lingered for the session's life (r13
          // ADVICE). Round 1's frontier is the seeds object == the old
          // `visited`, already released just above (no-op here).
          if (!(frontier eq next)) frontier.unpersist()
          frontier = next
          visited = grown
        }
        // roll up to the O(diameter) histogram DISTRIBUTED (the per-node
        // table is O(|V|) and must never collect), then land the tiny
        // result locally so the per-round persists can release here
        val hist = nodes.join(visited, Seq("node"), "left")
          .select(col("node"), coalesce(col("depth"), lit(-1L)).as("depth"))
          .groupBy("depth")
          .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        edges.unpersist(); nodes.unpersist()
        // the final round's frontier (== the last `next`) is distinct
        // from `visited` whenever the loop ran — release it too
        if (!(frontier eq visited)) frontier.unpersist()
        visited.unpersist()
        return hist.toDF("depth", "n_nodes", "min_node").orderBy("depth")
      }
    depths
      .groupBy("depth")
      .agg(count(lit(1)).as("n_nodes"), min(col("node")).as("min_node"))
      .orderBy("depth")
  }

  /** `graph_label_prop`: community detection by SYNCHRONOUS label
    * propagation (Raghavan et al.'s LPA) over the part co-purchase
    * projection — each node starts labeled with its own id and, for a
    * fixed `rounds` iterations, adopts the label held by the PLURALITY
    * of its neighbors (ties broken toward the SMALLEST label, which is
    * what makes synchronous LPA deterministic; the usual async
    * random-order variant is not oracle-able). Unlike
    * [[components]] (reachability — one label per connected component),
    * a fixed-round plurality vote splits a component along its dense
    * cores: boilerplate-cluster detection at corpus scale, community
    * grouping here. Output is community grain: (community label,
    * member count, smallest member), largest first.
    *
    * Scale shape: the corpus-sized stage is the shared projection
    * (served by [[GraphProjectionCache]] after its first build); each
    * round is two |E|-bounded hash aggregations — join labels at the
    * neighbor end (labels table is O(|V|), broadcast-able at any
    * realistic community-graph scale after thresholding; Catalyst picks
    * broadcast via size stats, no hint needed), count (node, label)
    * votes, then one min-struct argmax per node — the same map-side
    * partial-combine shape every round, no windows, no driver loops.
    * Fixed `rounds` keeps the plan static (no convergence check =
    * no per-round action); LPA on co-purchase graphs plateaus in 3-5
    * sync rounds (each round widens a node's horizon by one hop).
    *
    * Reference frame: capability category "enrichment pipelines"
    * (reference setup.py:8-9) — the community assignment every
    * source-level mixing policy groups by.
    *
    * scan-guard: graph_label_prop */
  /** Symmetrized adjacency via a single explode over the pinned edge
    * list (the pagerank explode device) — shared by [[labelProp]],
    * [[kcorePeel]], [[modularity]]. Scan behavior belongs to the
    * callers' guards. scan-guard: exempt (helper over an already
    * pinned edge list — no countable plan of its own) */
  private def symmetrize(edges: DataFrame): DataFrame =
    edges.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))

  /** The synchronous-LPA label table at NODE grain after `rounds`
    * votes — the shared core of [[labelProp]] (community rollup) and
    * [[modularity]] (partition quality). Each round: one |E|-bounded
    * vote count + one min-struct argmax, both map-side combined. */
  private def lpaLabels(adj: DataFrame, rounds: Int): DataFrame = {
    var labels = adj.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    for (_ <- 1 to rounds) {
      // votes: each edge (u, v) contributes v's current label to u;
      // argmax by (count desc, label asc) via one min-struct aggregate
      // (negated count), never a row_number window over vote rows
      labels = adj
        .join(labels.withColumnRenamed("node", "v"), Seq("v"))
        .groupBy(col("u"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l")))
          .as("best"))
        .select(col("u").as("node"), col("best.l").as("lbl"))
    }
    labels
  }

  def labelProp(lineitem: DataFrame, minSupport: Int = 2,
                rounds: Int = 3): DataFrame = {
    val edges = graft.plans.PlanPins.lazyPin(
      coPurchaseEdges(lineitem, minSupport))
    lpaLabels(symmetrize(edges), rounds)
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
      .orderBy(col("n_members").desc, col("community"))
  }

  /** `graph_modularity`: Newman modularity of the [[labelProp]]
    * partition — per community c, the intra-community edge count e_c,
    * the degree mass d_c, and the exact-integer micro contribution
    *   q_micro = (e_c·4m − d_c²)·10⁶ quot (4m²)
    * (global Q = one sum away; Q > 0 ⇒ denser-than-random cores, the
    * quality check that tells you whether the LPA communities mean
    * anything before a mixing policy groups by them). All integer:
    * edge/degree counts are exact, the division truncates identically
    * in both engines, and d_c² rides DECIMAL(38,0)/HUGEINT (d_c ≤ 2m;
    * 4m² passes BIGINT at m ≈ 1.5·10⁹ edges — the util_micro rule).
    *
    * Scale shape: the corpus-sized stage is the shared projection
    * (cached); the LPA label table is lazy-pinned at NODE grain — its
    * three consumers (both endpoint joins of the intra-edge count +
    * the degree census) would otherwise re-run the vote rounds per
    * branch. e_c = one join of the O(|E|) canonical edge list against
    * the label pin at both ends; d_c = one |E|-bounded census; m is a
    * 1-row broadcast. No windows, no collect.
    *
    * scan-guard: graph_modularity */
  def modularity(lineitem: DataFrame, minSupport: Int = 2,
                 rounds: Int = 3): DataFrame = {
    val edges = graft.plans.PlanPins.lazyPin(
      coPurchaseEdges(lineitem, minSupport))
    val labels = graft.plans.PlanPins.lazyPin(
      lpaLabels(symmetrize(edges), rounds))
    val m = broadcast(edges.agg(count(lit(1)).as("m")))
    val intra = edges
      .join(labels.select(col("node").as("a"), col("lbl").as("la")), Seq("a"))
      .join(labels.select(col("node").as("b"), col("lbl").as("lb")), Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val degree = symmetrize(edges)
      .join(labels.withColumnRenamed("node", "u"), Seq("u"))
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("degree_sum"))
    degree.join(intra, Seq("community"), "left")
      .withColumn("intra_edges", coalesce(col("intra_edges"), lit(0L)))
      .crossJoin(m)
      .select(col("community"), col("intra_edges"), col("degree_sum"),
        expr("""CAST(((CAST(intra_edges AS DECIMAL(38,0)) * 4 * m
                 - CAST(degree_sum AS DECIMAL(38,0)) * degree_sum) * 1000000)
                DIV (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)""")
          .as("q_micro"))
      .orderBy(col("q_micro").desc, col("community"))
  }

  /** `graph_kcore`: k-core refinement by FIXED-ROUND peeling — `rounds`
    * synchronous passes each remove every node whose degree in the
    * CURRENT surviving subgraph is below `k` (and all its edges), then
    * report each survivor's residual degree. The first peel is the
    * plain degree filter; each later pass catches nodes whose degree
    * only fell below k because a neighbor was peeled — the cascade that
    * makes "degree >= k" ≠ "k-core". Fixed rounds keep the plan static
    * and the oracle expressible (full convergence needs a fixpoint the
    * bag-semantics recursive CTE can't state); on a thresholded
    * co-purchase projection the cascade settles in 2-3 passes (each
    * pass needs a fresh boundary node, and support-thresholding has
    * already removed the long chains that delay settling). The dense
    * residue is the hub inventory [[labelProp]] assigns communities to
    * and [[triangles]] counts closures in.
    *
    * Scale shape: the corpus-sized stage is the shared projection
    * (lazy-pinned; served by [[GraphProjectionCache]]); each pass is
    * one O(|E|) hash-agg degree census plus two semi-joins of the edge
    * list against the O(|V|) SURVIVOR PIN. Pinning the survivor set
    * (not the edge list) is load-bearing twice over: (a) it is what
    * keeps the unrolled plan LINEAR — the census branch terminates in
    * a pin leaf instead of duplicating the edge chain, and the first
    * cut (edges unpinned, tree copied 2^rounds×) measured 233 s at
    * sf10 of which 203 s was JIT compiling the exploded codegen
    * classes, vs 3.6 s with the pins; (b) survivor pins are node-grain
    * leaves, so the lineitem scans stay inside the ONE edges pin where
    * the scan-count guard sees them (an edge-list pin chain nests them
    * out of sight). Degree censuses stay map-side-combined hash aggs,
    * never per-node count windows (a hub node would buffer its whole
    * partition in one task). No driver loop, no collect.
    *
    * Reference frame: capability category "enrichment pipelines"
    * (reference setup.py:8-9) — the dense-core flag for hub-document
    * policies, same family as [[labelProp]] / [[bfsDepths]].
    *
    * scan-guard: graph_kcore */
  def kcorePeel(lineitem: DataFrame, k: Int = 3, minSupport: Int = 2,
                rounds: Int = 3): DataFrame = {
    val edges = graft.plans.PlanPins.lazyPin(
      coPurchaseEdges(lineitem, minSupport))
    var adj = edges.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    for (_ <- 1 to rounds) {
      val survivors = graft.plans.PlanPins.lazyPin(
        adj.groupBy(col("u"))
          .agg(count(lit(1)).as("d"))
          .filter(col("d") >= k)
          .select(col("u").as("node")))
      adj = adj.join(survivors.withColumnRenamed("node", "u"),
          Seq("u"), "left_semi")
        .join(survivors.withColumnRenamed("node", "v"),
          Seq("v"), "left_semi")
    }
    adj.groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))
      .orderBy("node")
  }
}
