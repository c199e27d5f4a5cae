package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics of the round-8 additions (SURVEY §2-B-septies) beyond the
  * oracle gate: allocation properties for the Neyman sampler, ranking
  * properties for tf-idf, and geometric sanity for centroid drift.
  */
class RoundEightOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("sampleNeyman: total ≈ budget, every stratum represented, deterministic") {
    val out = CorpusOps.sampleNeyman(docs, budget = 20).collect()
    val strata = docs.select("lang").distinct().count()
    // per-stratum rounding ±0.5 and the ≥1 floor bound the total
    assert(out.length >= 20 - strata && out.length <= 20 + strata,
      s"allocation drifted: ${out.length} picks for budget 20 ($strata strata)")
    val perLang = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.size.toLong == strata, "a stratum got zero picks")
    assert(perLang.values.forall(_ >= 1))
    // rnk is 1..n_h within each stratum (the rank actually gated picks)
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val rnks = rows.map(_.getInt(2)).sorted
      assert(rnks.toSeq == (1 to rows.length).toSeq)
    }
    val again = CorpusOps.sampleNeyman(docs, budget = 20).collect()
    assert(out.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
  }

  test("sampleNeyman: higher-dispersion stratum wins budget at equal size") {
    val sess = spark
    import sess.implicits._
    // two strata, same size; "wide" has 10x the spread of "narrow"
    val d = (1 to 200).map { i =>
      if (i <= 100) (i.toLong, s"t$i", "narrow", 1000L + (i % 10))
      else (i.toLong, s"t$i", "wide", 1000L + (i % 10) * 100)
    }.toDF("doc_id", "text", "lang", "n_chars")
    val picks = CorpusOps.sampleNeyman(d, budget = 50).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(picks("wide") > picks("narrow") * 5,
      s"Neyman allocation ignored dispersion: $picks")
  }

  test("tfidfKeywords: ranks are 1..3, words distinct per doc, scores non-increasing") {
    val rows = TextOps.tfidfKeywords(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, ks) =>
      val sorted = ks.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length).toSeq)
      assert(sorted.map(_._3).distinct.length == sorted.length,
        s"doc $id repeated a keyword")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4 || (a._4 == b._4)
        case _ => true
      }, s"doc $id scores increase with rank")
    }
  }

  test("heavyHitterWords: Space-Saving guarantees hold against exact counts") {
    val sess = spark
    import sess.implicits._
    // planted Zipf-ish skew across MORE distinct words than the sketch's
    // capacity, spread over rows so partitioning exercises the merge
    val words = (1 to 2000).flatMap { i =>
      val heavy = Seq.fill(40)(s"w${i % 5}")          // 5 keys at ~16k each
      val mid = Seq.fill(4)(s"m${i % 40}")            // 40 keys at ~200
      val tail = Seq(s"t$i")                          // 2000 singletons
      heavy ++ mid ++ tail
    }
    val docs = words.grouped(90).zipWithIndex
      .map { case (ws, id) => (id.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val n = words.length.toLong
    val capacity = 64
    val exact = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val hh = TextOps.heavyHitterWords(docs, capacity = capacity, topK = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // overestimate-only with bounded error
    hh.foreach { case (w, est, err) =>
      val truth = exact.getOrElse(w, 0L)
      assert(est >= truth, s"$w underestimated: $est < $truth")
      assert(est - err <= truth, s"$w err bound broken: est=$est err=$err true=$truth")
      assert(err <= n / capacity + 1, s"$w err $err exceeds n/capacity=${n / capacity}")
    }
    // no false negatives above the threshold: the 5 heavy keys dominate
    val found = hh.map(_._1).toSet
    (0 until 5).foreach(i => assert(found.contains(s"w$i"),
      s"heavy key w$i (true=${exact(s"w$i")}) missing above n/capacity threshold"))
  }

  test("sampleRejection: flattens length buckets, deterministic, oracle-exact coin") {
    val out = CorpusOps.sampleRejection(docs).collect()
    assert(out.nonEmpty)
    val again = CorpusOps.sampleRejection(docs).collect()
    assert(out.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
    // post-sample bucket counts should be near-uniform: every bucket's
    // expected keep is the min bucket count; allow binomial slack
    val kept = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    val pre = docs.selectExpr("n_chars DIV 500 AS b").groupBy("b").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minc = pre.values.min.toDouble
    kept.foreach { case (b, k) =>
      assert(k <= pre(b), s"bucket $b kept more than it had")
      assert(math.abs(k - minc) <= 4 * math.sqrt(minc) + 3,
        s"bucket $b kept $k, expected ~$minc (binomial slack exceeded)")
    }
  }

  test("centroidDrift: one row per label, cosine in [-1,1], counts conserve") {
    val emb = Tables.embeddings(spark, sf())
    val out = VectorOps.centroidDrift(emb).collect()
    assert(out.length == emb.select("label").distinct().count())
    assert(out.map(_.getLong(1)).sum == emb.count())
    out.foreach { r =>
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
    }
    // labeled Gaussian clusters away from the origin: every label centroid
    // should correlate positively with the global centroid on this fixture
    assert(out.map(_.getDouble(2)).max > 0)
  }
}
