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
