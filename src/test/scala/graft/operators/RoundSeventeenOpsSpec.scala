package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Hand-computed pins for the round-17 work: the composed IVF+PQ tier
  * (VERDICT r16 #2) — cell-routed ADC + exact rerank — and its combined
  * codes projection / recall audit. The minhash incremental fold is
  * covered by MinhashMaintenanceSpec. */
class RoundSeventeenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def toyCorpus(n: Int = 40, plantCopyOfProbe: Boolean = true) = {
    val rnd = new scala.util.Random(7)
    val base = (0L until (n - 1).toLong).map { id =>
      (id, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val rows =
      if (plantCopyOfProbe) base :+ (((n - 1).toLong, base.head._2.clone()))
      else base :+ (((n - 1).toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f)))
    rows.toDF("vec_id", "embedding")
  }

  test("sim_ann_ivfpq: the planted exact copy survives routing + ADC and reranks to cos 1.0") {
    val docs = toyCorpus()
    val out = VectorOps.annIvfPq(docs, topR = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // an exact copy shares the probe's cell (deterministic cellAssign)
    // and its packed code (identical subvectors), so it must route,
    // survive ADC, and rerank to the top at exact cosine 1.0
    assert(out.take(2).toSeq == Seq((0L, 1.0), (39L, 1.0)),
      s"ivfpq top-2: ${out.take(3).toSeq}")
    assert(out.length == 10)
    val cs = out.map(_._2).toSeq
    assert(cs == cs.sorted.reverse)
  }

  test("sim_ann_ivfpq: probing every cell with corpus-wide topR degrades to exact top-k") {
    val docs = toyCorpus(plantCopyOfProbe = false)
    val exact = VectorOps.cosineTopK(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val full = VectorOps.annIvfPq(docs, nprobe = 8, topR = 40).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == exact,
      "nprobe = nlist and topR = |corpus| must reduce the ladder to exact")
  }

  test("ivfPqCodes: one row per vector, cell == index assignment, pq_code == flat codes") {
    val docs = toyCorpus()
    val codes = VectorOps.ivfPqCodes(docs)
    assert(codes.count() == 40)
    // cells match the cached index's assignment table
    val idx = VectorOps.cachedIvfIndex(docs)
    val cellMismatch = codes.select(col("vec_id"), col("cell"))
      .join(idx.assigned.select(col("vec_id"), col("cell").as("icell")), "vec_id")
      .filter(col("cell") =!= col("icell")).count()
    assert(cellMismatch == 0, "combined projection disagrees with IvfIndex cells")
    // packed codes match the flat PQ codes projection
    val codeMismatch = codes.select(col("vec_id"), col("pq_code"))
      .join(VectorOps.pqEncode(docs).select(col("vec_id"),
        col("pq_code").as("flat")), "vec_id")
      .filter(col("pq_code") =!= col("flat")).count()
    assert(codeMismatch == 0, "combined projection disagrees with flat PQ codes")
  }

  test("sim_ann_ivfpq_batch: probe 0's rows equal the single-probe ladder; ranks are dense per probe") {
    val docs = toyCorpus()
    val batch = VectorOps.annIvfPqBatch(docs, nProbes = 5, topR = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val single = VectorOps.annIvfPq(docs, probeId = 0L, topR = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // the batch plan shares routing/codes/rerank with the single-probe
    // form — probe 0's slice must agree exactly
    assert(batch.filter(_._1 == 0L).map(t => (t._2, t._3)).toSeq ==
      single.toSeq)
    // 5 probes x kNn rows, rank dense 1..10 per probe, cos descending
    assert(batch.length == 50)
    (0L until 5L).foreach { p =>
      val rows = batch.filter(_._1 == p)
      assert(rows.map(_._4).toSeq == (1 to 10), s"probe $p ranks")
      val cs = rows.map(_._3).toSeq
      assert(cs == cs.sorted.reverse, s"probe $p cos order")
    }
  }

  test("retrieval_ivfpq_recall: one audited row; full probing + corpus topR gives recall 1.0") {
    val docs = toyCorpus(plantCopyOfProbe = false)
    val r = RetrievalOps.ivfPqRecall(docs).collect()
    assert(r.length == 1)
    val (nExact, nHit, recall) = (r(0).getLong(0), r(0).getLong(1), r(0).getLong(2))
    assert(nExact == 10L)
    assert(nHit >= 1L && nHit <= 10L) // the probe itself always survives
    assert(recall == nHit * 1000000L / nExact)
  }
}
