package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Retrieval operators: BM25 semantics re-derived naively in plain Scala
  * on the real corpus (the oracle gate checks DuckDB equivalence; this
  * pins the math itself), chunker coverage/overlap properties, and the
  * plan shapes SCALE.md claims for both.
  */
class RetrievalOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("bm25 matches a naive driver-side recomputation on the real corpus") {
    val corpus = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split(" ").filter(_.nonEmpty).toSeq).toMap
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val terms = RetrievalOps.defaultQuery
    val dfCount = terms.map(t => t -> corpus.count(_._2.contains(t))).toMap
    val scored = corpus.toSeq.flatMap { case (id, toks) =>
      val contribs = terms.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + ((n - dfCount(t)) + 0.5) / (dfCount(t) + 0.5))
          val sat = (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * (toks.size / avgdl)))
          Some(math.round(idf * sat * 1000000.0))
        }
      }
      if (contribs.isEmpty) None
      else Some((id, contribs.size.toLong, contribs.sum))
    }
    val want = scored.sortBy { case (id, _, s) => (-s, id) }.take(20)
    val got = RetrievalOps.bm25(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
  }

  test("bm25 ranks a term-stuffed doc above a single-mention doc") {
    val sess = spark
    import sess.implicits._
    val fixture = Seq(
      (1L, "spark join vector stream window spark join vector stream window"),
      (2L, "spark appears once here amid plenty of other filler words content"),
      (3L, "no query words at all in this entirely unrelated document text"))
      .toDF("doc_id", "text")
    val got = RetrievalOps.bm25(fixture, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // doc 3 matches nothing and must not appear; doc 1 outranks doc 2
    assert(got.map(_._1) === Seq(1L, 2L))
    assert(got.head._2 === 5L) // all five query terms matched
  }

  test("chunkOverlap emits the exact sliding windows, tail chunk short") {
    val sess = spark
    import sess.implicits._
    val toks = (0 until 10).map(i => s"t$i")
    val fixture = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
    val got = RetrievalOps.chunkOverlap(fixture, win = 4, stride = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // starts 0,3,6,9; window 4; the last chunk has only 1 token left
    assert(got.map(c => (c._1, c._2, c._3)).toSeq ===
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    def md5hex(s: String) = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    got.foreach { case (_, start, len, hash) =>
      val expect = toks.slice(start.toInt, start.toInt + 4).mkString(" ")
      assert(len === math.min(4, 10 - start))
      assert(hash === md5hex(expect))
    }
    // consecutive chunks overlap by win - stride = 1 token; union covers
    // the whole document with no gaps
    val covered = got.flatMap(c => c._2.toInt until (c._2 + c._3).toInt).toSet
    assert(covered === (0 until 10).toSet)
  }

  test("chunkOverlap skips empty documents") {
    val sess = spark
    import sess.implicits._
    val fixture = Seq((1L, ""), (2L, "  "), (3L, "one two")).toDF("doc_id", "text")
    val got = RetrievalOps.chunkOverlap(fixture, win = 4, stride = 3).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("chunkOverlap invariants hold across random doc sizes and win/stride") {
    // fixed-seed generated cases (same pattern as ShingleKernelsSpec):
    // full coverage without gaps, per-chunk token counts, chunk count =
    // ceil(n/stride), constant overlap except at the tail
    val sess = spark
    import sess.implicits._
    val cases = for {
      n <- Seq(1, 2, 5, 47, 100)
      (win, stride) <- Seq((8, 8), (8, 5), (16, 12), (4, 1))
    } yield (n, win, stride)
    cases.foreach { case (n, win, stride) =>
      val fixture = Seq((1L, (0 until n).map(i => s"w$i").mkString(" ")))
        .toDF("doc_id", "text")
      val got = RetrievalOps.chunkOverlap(fixture, win, stride).collect()
        .map(r => (r.getLong(2), r.getLong(3))) // (start, chunk_tokens)
      val expectChunks = (n + stride - 1) / stride
      assert(got.length === expectChunks, s"n=$n win=$win stride=$stride")
      got.foreach { case (start, len) =>
        assert(len === math.min(win, n - start), s"n=$n win=$win stride=$stride start=$start")
      }
      val covered = got.flatMap(c => c._1.toInt until (c._1 + c._2).toInt).toSet
      assert(covered === (0 until n).toSet, s"coverage gap: n=$n win=$win stride=$stride")
    }
  }

  test("ivfpq curve monotonicity: recall non-decreasing in topR (exact) and nprobe (tolerance) — r18, VERDICT r17 #6") {
    val emb = Tables.embeddings(spark, sf())
    val nProbes = 10; val k = 10
    def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("probe_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topkSets(VectorOps.batchCosineTopK(emb, nProbes, k))
    def recall(np: Int, tr: Int): Double = {
      val got = topkSets(VectorOps.annIvfPqBatch(emb, nProbes, k, tr,
        nlist = 8, nprobe = np))
      exact.map { case (p, want) =>
        got.getOrElse(p, Set.empty).count(want) / want.size.toDouble
      }.sum / exact.size
    }
    val nprobes = Seq(1, 2, 4, 8); val topRs = Seq(10, 50)
    val grid = (for (np <- nprobes; tr <- topRs) yield (np, tr) ->
      recall(np, tr)).toMap
    // topR at fixed nprobe: the ADC survivor prefix is NESTED and the
    // rerank is exact over a superset — recall non-decreasing EXACTLY
    nprobes.foreach { np =>
      assert(grid((np, 50)) >= grid((np, 10)),
        s"recall fell as topR grew at nprobe=$np: $grid")
    }
    // nprobe at fixed topR: a larger candidate pool can displace a true
    // neighbor out of a small topR via ADC noise — non-decreasing within
    // one probe-item of tolerance (1/(nProbes*k) granularity × a few)
    topRs.foreach { tr =>
      nprobes.sliding(2).foreach { case Seq(a, b) =>
        assert(grid((b, tr)) >= grid((a, tr)) - 0.05,
          s"recall fell >0.05 from nprobe=$a to $b at topR=$tr: $grid")
      }
    }
    // the degenerate corner is EXACT: every cell probed + every
    // candidate surviving ⇒ the exact rerank sees the whole corpus and
    // the ladder IS the exact sweep (recall 1.0, no tolerance)
    val full = recall(8, emb.count().toInt)
    assert(full == 1.0, s"full-probe/full-survivor recall $full != 1.0")
  }

  test("bm25 plan: text never crosses an exchange; top-k is TakeOrdered") {
    val plan = RetrievalOps.bm25(docs).queryExecution.executedPlan.treeString
    // the corpus-wide pass reduces to matched (doc_id, term, dl) postings
    // BEFORE the tf shuffle — full text must stay map-side
    val exchanges = plan.split("\n").filter(_.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty, plan)
    assert(!exchanges.exists(_.contains("text#")),
      s"full text flows through a bm25 shuffle:\n$plan")
    // df (<= |query| rows) and the 1-row stats broadcast; the final top-k
    // must be TakeOrdered, never a global sort
    assert(plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("chunkOverlap plan: map-only — no hash exchange anywhere") {
    // one Generate stage over the scan; the only exchange allowed is the
    // final range partitioning for the deterministic output order
    val plan = RetrievalOps.chunkOverlap(docs).queryExecution.executedPlan.treeString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chunker should not shuffle:\n$plan")
  }
}
