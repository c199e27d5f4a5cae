package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import graft.operators.DedupOps
import graft.sources.InMemoryBus

/** The incremental-maintenance twin of the minhash near-dup pair
  * projection (VERDICT r16 #1): document appends arriving on the bus
  * fold into a versioned (signature store, pairs) state that must equal
  * the batch REBUILD ([[DedupOps.nearMinhash]]) over the union of all
  * appended documents — exactly, at every prefix, and under replayed
  * micro-batches. */
class MinhashMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  /** 10 docs: two exact duplicates (J = 1.0 — found regardless of LSH
    * luck), a near pair sharing most 3-shingles, singletons, and a doc
    * too short to shingle (drops out of every path identically). */
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog today",
    2L -> "the quick brown fox jumps over the lazy dog today",
    3L -> "a completely different document about spark query planning",
    4L -> "the quick brown fox jumps over the lazy dog tonight",
    5L -> "short doc",
    6L -> "partition pruning and predicate pushdown save petabytes of scan",
    7L -> "yet another unrelated piece of text with its own words",
    8L -> "a completely different document about spark query planning",
    9L -> "counting tokens and scoring quality over web documents",
    10L -> "streaming appends fold into the sunk signature store")

  private def docsDf(ds: Seq[(Long, String)]) = ds.toDF("doc_id", "text")

  private def rebuild(ds: Seq[(Long, String)]): Seq[(Long, Long, Double)] =
    DedupOps.nearMinhash(docsDf(ds))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def pairRows(m: MinhashMaintenance): Seq[(Long, Long, Double)] =
    m.currentPairs().orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def freshDirs(): (String, String) = (
    Files.createTempDirectory("mm-state-").toString,
    Files.createTempDirectory("mm-ckpt-").toString)

  test("bus-streamed document appends fold to exactly the batch rebuild") {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val topic = s"mm-in-$id"; val sub = s"mm-sub-$id"
    InMemoryBus.createTopic(topic)
    InMemoryBus.createSubscription(topic, sub)
    docs.foreach { case (d, t) =>
      InMemoryBus.publish(topic,
        s"""{"doc_id":$d,"text":"$t"}""".getBytes(UTF_8))
    }
    val (stateDir, ckptDir) = freshDirs()
    // bulkLimit 4 forces the 10 docs through >= 3 micro-batches — the
    // multi-fold path, not one lucky single-batch rebuild
    val m = new MinhashMaintenance(spark, sub, stateDir, ckptDir,
      bulkLimit = 4)
    val q = m.start(availableNow = true)
    assert(q.awaitTermination(120000), "AvailableNow drain timed out")
    assert(m.lastApplied() >= 2,
      s"expected >= 3 micro-batches, got last batchId ${m.lastApplied()}")
    assert(pairRows(m) == rebuild(docs))
    // planted exact duplicates are found with jaccard 1.0 — the fold's
    // equality with the rebuild must not be vacuous
    assert(pairRows(m).contains((1L, 2L, 1.0)))
    assert(pairRows(m).contains((3L, 8L, 1.0)))
    // ack-on-commit: committed prefix reaches the published count
    val deadline = System.currentTimeMillis + 20000
    while (System.currentTimeMillis < deadline &&
      InMemoryBus.committedOffset(sub) < docs.size) Thread.sleep(50)
    assert(InMemoryBus.committedOffset(sub) == docs.size)
  }

  test("every prefix of appends equals its own rebuild (cross-batch pairs, not luck)") {
    val (stateDir, ckptDir) = freshDirs()
    val m = new MinhashMaintenance(spark, "unused-sub", stateDir, ckptDir)
    // groups of 3: doc 2 (dup of 1) lands in batch 0 with it, but doc 8
    // (dup of 3) arrives two batches after 3 — the delta-vs-store path
    docs.grouped(3).zipWithIndex.foreach { case (chunk, i) =>
      m.applyBatch(docsDf(chunk), batchId = i.toLong)
      assert(pairRows(m) == rebuild(docs.take(3 * (i + 1))),
        s"pairs after batch $i diverged from the rebuild of its prefix")
    }
    assert(pairRows(m).contains((3L, 8L, 1.0)),
      "the cross-batch duplicate pair was not found by the delta-vs-store join")
  }

  test("replayed and stale batchIds are idempotent (crash-before-checkpoint)") {
    val (stateDir, ckptDir) = freshDirs()
    val m = new MinhashMaintenance(spark, "unused-sub", stateDir, ckptDir)
    val b0 = docsDf(docs.take(5))
    val b1 = docsDf(docs.drop(5))
    m.applyBatch(b0, batchId = 0L)
    m.applyBatch(b1, batchId = 1L)
    val committed = pairRows(m)
    assert(committed == rebuild(docs))
    // a replay re-delivers the SAME batchId: must be a no-op, or the
    // pair rows duplicate
    m.applyBatch(b1, batchId = 1L)
    m.applyBatch(b0, batchId = 0L) // stale id after a later commit
    assert(pairRows(m) == committed)
    assert(m.lastApplied() == 1L)
  }

  test("bus stop/resume under RocksDB: the maintainer resumes mid-corpus on the corpus-scale provider (r18)") {
    // VERDICT r17 #5: the maintainers' specs ran only on the default
    // HDFS-backed store. The foreachBatch query itself is stateless (the
    // pair state is the versioned parquet protocol), but a deployment
    // sets the provider GLOBALLY — this proves the composition: RocksDB
    // provider + checkpoint stop/resume + VersionedStateDir lineage.
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val id = java.util.UUID.randomUUID().toString.take(8)
    val topic = s"mmr-in-$id"; val sub = s"mmr-sub-$id"
    InMemoryBus.createTopic(topic)
    InMemoryBus.createSubscription(topic, sub)
    val (stateDir, ckptDir) = freshDirs()
    def publish(ds: Seq[(Long, String)]): Unit = ds.foreach { case (d, t) =>
      InMemoryBus.publish(topic,
        s"""{"doc_id":$d,"text":"$t"}""".getBytes(UTF_8))
    }
    publish(docs.take(5))
    val m1 = new MinhashMaintenance(s, sub, stateDir, ckptDir, bulkLimit = 3)
    val q1 = m1.start(availableNow = true)
    assert(q1.awaitTermination(120000), "wave-1 drain timed out")
    assert(pairRows(m1) == rebuild(docs.take(5)))
    // wave 2 on the SAME checkpoint + state: the cross-wave duplicate
    // pair (3, 8) must come from the delta-vs-RESTORED-store join
    publish(docs.drop(5))
    val m2 = new MinhashMaintenance(s, sub, stateDir, ckptDir, bulkLimit = 3)
    val q2 = m2.start(availableNow = true)
    assert(q2.awaitTermination(120000), "wave-2 drain timed out")
    assert(pairRows(m2) == rebuild(docs))
    assert(pairRows(m2).contains((3L, 8L, 1.0)),
      "the cross-restart duplicate pair was not found on restored state")
  }

  test("the sunk bands table equals a re-band of the store at every prefix (r18)") {
    val (stateDir, ckptDir) = freshDirs()
    val m = new MinhashMaintenance(spark, "unused-sub", stateDir, ckptDir)
    def bandRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.selectExpr("doc_id", "bk.band", "bk.bh")
        .collect().map(_.toString).sorted.toSeq
    docs.grouped(4).zipWithIndex.foreach { case (chunk, i) =>
      m.applyBatch(docsDf(chunk), batchId = i.toLong)
      // the fold's store side scans these sunk rows instead of
      // re-banding — they must BE the re-band, row for row, or the
      // candidate join silently loses (or invents) band collisions
      val rebanded = DedupOps.minhashBanded(
        DedupOps.minhashEnriched(docsDf(docs.take(4 * (i + 1)))), 32, 4)
      assert(m.currentBands().isDefined, s"no bands table after batch $i")
      assert(bandRows(m.currentBands().get) == bandRows(rebanded),
        s"sunk bands diverged from the re-band after batch $i")
    }
  }

  test("a legacy two-table state version seeds the bands table on its next fold (r18)") {
    val (stateDir, ckptDir) = freshDirs()
    val m = new MinhashMaintenance(spark, "unused-sub", stateDir, ckptDir)
    m.applyBatch(docsDf(docs.take(5)), batchId = 0L)
    // simulate a pre-r18 state dir: drop the bands table from v0
    val bandsDir = java.nio.file.Paths.get(stateDir, "v0", "bands")
    val w = Files.walk(bandsDir)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally w.close()
    assert(m.currentBands().isEmpty, "legacy simulation failed")
    // the next fold re-bands the store once (the fallback path), finds
    // the same pairs, and sinks a complete bands table
    m.applyBatch(docsDf(docs.drop(5)), batchId = 1L)
    assert(pairRows(m) == rebuild(docs))
    assert(m.currentBands().isDefined, "bands table not seeded")
    assert(m.currentBands().get.count() ==
      DedupOps.minhashBanded(DedupOps.minhashEnriched(docsDf(docs)), 32, 4)
        .count())
  }

  test("dedup_minhash_incr: the batched fold equals the one-shot rebuild") {
    val incr = DedupOps.nearMinhashIncremental(docsDf(docs), nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(incr == rebuild(docs))
    assert(incr.contains((1L, 2L, 1.0)))
    // doc_id % 4 puts 3 and 8 in different batches — the registry slug
    // exercises the delta-vs-store path too
    assert(incr.contains((3L, 8L, 1.0)))
  }
}
