package graft.operators

import graft.{SparkSpec, Tables}

/** GraphProjectionCache (round 13; DEFAULT ON since round 14 — the r13
  * verdict's top item): the graph family's shared co-purchase
  * projection behind a conf-gated, file-backed, session-scoped cache.
  * Assertions:
  *
  *  - conf ON (now the default): first construction writes exactly one
  *    cache entry, the second construction of the same
  *    (corpus, support) adds none and its plan scans ONLY the cache
  *    dir (no lineitem files);
  *  - conf OFF: construction registers NOTHING for that session — the
  *    pre-r14 plan shape is one conf away;
  *  - the cached edge set is row-identical to the uncached projection;
  *  - `minSupport` is part of the key (different support, new entry);
  *  - a support high enough to empty the projection round-trips the
  *    zero-row write (explicit-schema read-back);
  *  - all four family queries return identical rows cache-on vs off.
  *
  * Conf is set on a CLONED session (`newSession`) — the shared spec
  * session's conf is never mutated (the PlanGuardSpec-race lesson,
  * r12 verdict) — and entry counts are PER-SESSION
  * (`entryCountFor`): with the cache on by default, concurrently
  * running suites move the global count. */
class GraphProjectionCacheSpec extends SparkSpec {

  private def cachedSession() = {
    val s = spark.newSession()
    s.conf.set(GraphProjectionCache.ConfKey, "true")
    s
  }

  private def uncachedSession() = {
    val s = spark.newSession()
    s.conf.set(GraphProjectionCache.ConfKey, "false")
    s
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("conf defaults ON; a conf-off session registers no entries") {
    val sDefault = spark.newSession()
    assert(GraphProjectionCache.entryCountFor(sDefault) == 0)
    GraphOps.coPurchaseEdges(Tables.lineitem(sDefault, sf()), 2)
    assert(GraphProjectionCache.entryCountFor(sDefault) == 1,
      "default-on session must write a cache entry at construction")
    val sOff = uncachedSession()
    GraphOps.coPurchaseEdges(Tables.lineitem(sOff, sf()), 2)
    assert(GraphProjectionCache.entryCountFor(sOff) == 0,
      "conf-off session must not register cache entries")
  }

  test("cache hit: one entry, second build scans only the cache dir") {
    val s = cachedSession()
    val reference = edgeSet(
      GraphOps.coPurchaseEdges(Tables.lineitem(uncachedSession(), sf()), 2))
    val first = GraphOps.coPurchaseEdges(Tables.lineitem(s, sf()), 2)
    assert(GraphProjectionCache.entryCountFor(s) == 1)
    assert(edgeSet(first) == reference)
    val second = GraphOps.coPurchaseEdges(Tables.lineitem(s, sf()), 2)
    assert(GraphProjectionCache.entryCountFor(s) == 1,
      "same (corpus, support) must not write a second entry")
    assert(second.inputFiles.nonEmpty &&
      second.inputFiles.forall(_.contains("graft-proj-graph")),
      s"cached read must scan the cache dir only: " +
        second.inputFiles.mkString(", "))
    assert(edgeSet(second) == reference)
  }

  test("minSupport is part of the key; empty projection round-trips") {
    val s = cachedSession()
    GraphOps.coPurchaseEdges(Tables.lineitem(s, sf()), 2).collect()
    val c0 = GraphProjectionCache.entryCountFor(s)
    val sup3 = GraphOps.coPurchaseEdges(Tables.lineitem(s, sf()), 3)
    assert(GraphProjectionCache.entryCountFor(s) == c0 + 1)
    assert(edgeSet(sup3) == edgeSet(
      GraphOps.coPurchaseEdges(Tables.lineitem(uncachedSession(), sf()), 3)))
    // a support no pair reaches: zero-row write, schema'd read-back
    val empty = GraphOps.coPurchaseEdges(Tables.lineitem(s, sf()), 999999)
    assert(empty.collect().isEmpty)
    assert(empty.schema.fieldNames.toSeq == Seq("a", "b"))
  }

  test("all six graph queries: identical rows cache-on vs cache-off") {
    val s = cachedSession()
    val sOff = uncachedSession()
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq
    val liOff = Tables.lineitem(sOff, sf())
    val liOn = Tables.lineitem(s, sf())
    assert(rows(GraphOps.triangles(liOn)) == rows(GraphOps.triangles(liOff)))
    assert(rows(GraphOps.jaccardLinks(liOn)) ==
      rows(GraphOps.jaccardLinks(liOff)))
    assert(rows(GraphOps.components(liOn)) ==
      rows(GraphOps.components(liOff)))
    assert(rows(GraphOps.bfsDepths(liOn)) == rows(GraphOps.bfsDepths(liOff)))
    // the r14 bipartite projection consumers (custSuppEdges)
    val oOff = Tables.orders(sOff, sf())
    val oOn = Tables.orders(s, sf())
    assert(rows(GraphOps.pagerank(oOn, liOn)) ==
      rows(GraphOps.pagerank(oOff, liOff)))
    assert(rows(GraphOps.degreeStats(oOn, liOn)) ==
      rows(GraphOps.degreeStats(oOff, liOff)))
    // the r14 community trio rides the same cached projection
    assert(rows(GraphOps.labelProp(liOn)) == rows(GraphOps.labelProp(liOff)))
    assert(rows(GraphOps.kcorePeel(liOn)) == rows(GraphOps.kcorePeel(liOff)))
    assert(rows(GraphOps.modularity(liOn)) ==
      rows(GraphOps.modularity(liOff)))
  }

  test("durable store (r19): two sessions share ONE content-addressed artifact; a store-disabled session builds privately") {
    // the cross-session path of VERDICT r18 Next #3: same corpus + same
    // params must resolve to the SAME on-disk artifact across sessions
    // (the cold-JVM case is the same code path — the second session
    // takes the STORE HIT branch, not the in-memory dirs map).
    // The store is default-OFF since the r19 optimization round (a
    // measured run must compute from the parquet inputs); deployments
    // — and this spec — opt in with an explicit directory.
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-store-spec").toString
    val s1 = cachedSession()
    val s2 = cachedSession()
    s1.conf.set("spark.graft.projection.store", storeDir)
    s2.conf.set("spark.graft.projection.store", storeDir)
    GraphOps.coPurchaseEdges(Tables.lineitem(s1, sf()), 2).collect()
    val second = GraphOps.coPurchaseEdges(Tables.lineitem(s2, sf()), 2)
    second.collect()
    val d1 = graft.plans.ProjectionCache.dirsFor(s1, "graph").toSet
    val d2 = graft.plans.ProjectionCache.dirsFor(s2, "graph").toSet
    assert(d1.nonEmpty && (d1 intersect d2).nonEmpty,
      s"sessions must share the content-addressed artifact: $d1 vs $d2")
    assert(second.inputFiles.forall(_.contains(storeDir)),
      "durable read must scan the store dir: " +
        second.inputFiles.take(3).mkString(", "))
    // store at default (disabled): the per-session tmp build
    // (janitor-owned), and its dir must NOT be the shared artifact
    val sPriv = cachedSession()
    GraphOps.coPurchaseEdges(Tables.lineitem(sPriv, sf()), 2).collect()
    val dPriv = graft.plans.ProjectionCache.dirsFor(sPriv, "graph").toSet
    assert(dPriv.nonEmpty && (dPriv intersect d1).isEmpty,
      s"store-off session must build privately: $dPriv")
  }
}
