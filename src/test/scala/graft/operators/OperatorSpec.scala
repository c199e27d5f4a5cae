package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Unit specs for operators whose semantics the DuckDB oracle can't check
  * (approximate / hash-based / heuristic ops — SURVEY §2-B ✗ rows).
  */
class OperatorSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("join_anti drops exactly the customers with a post-cutoff order (nonempty)") {
    // r7 de-vacuization evidence: the sf0.001 gate data has no dormant
    // customer, so the nonempty path is proven on planted frames here
    // (and at sf0.01 by the driver gate, where 8 rows survive)
    val sess = spark
    import sess.implicits._
    val customer = Seq((1L, "alice"), (2L, "bob"), (3L, "carol"))
      .toDF("c_custkey", "c_name")
    val orders = Seq(
      (1L, "1997-06-01 00:00:00"), // pre-cutoff only -> dormant
      (2L, "1998-03-01 00:00:00"), // post-cutoff -> active
      (2L, "1997-01-01 00:00:00")
      // carol: no orders at all -> dormant
    ).toDF("o_custkey", "d").select(col("o_custkey"),
      col("d").cast("timestamp").as("o_orderdate"))
    val out = Joins.anti(customer, orders).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 3L))
  }

  test("set_except keeps nations whose suppliers are all below the balance bar (nonempty)") {
    val sess = spark
    import sess.implicits._
    val customer = Seq(10L, 20L, 30L).toDF("c_nationkey")
    val supplier = Seq(
      (10L, 9500.0), // rich supplier -> nation 10 excluded
      (20L, 100.0), // poor supplier only -> nation 20 kept
      (40L, 9999.0) // no customers -> irrelevant
      // nation 30: no suppliers at all -> kept
    ).toDF("s_nationkey", "s_acctbal")
    val out = SortsSets.exceptNations(customer, supplier).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(20L, 30L))
  }

  test("withReingested plants exact-duplicate pairs the near-dup detector finds") {
    val emb = Tables.embeddings(spark, sf())
    val corpus = VectorOps.withReingested(emb)
    val planted = emb.filter(col("vec_id") % 50 === 0).count()
    assert(planted > 0 && corpus.count() === emb.count() + planted)
    val pairs = VectorOps.nearDupEmbedding(corpus, nBands = 4, bitsPerBand = 6)
      .collect()
    // every planted copy is found as (orig, orig + 1000000) at cos 1.0
    assert(pairs.length >= planted,
      s"expected >= $planted planted pairs, got ${pairs.length}")
    val plantedPairs = pairs.filter(r => r.getLong(1) == r.getLong(0) + 1000000L)
    assert(plantedPairs.length === planted)
    assert(plantedPairs.forall(_.getDouble(2) === 1.0))
  }

  test("dedup_exact keeps the lowest doc_id of each duplicate group") {
    val df = docs(5L -> "a b c", 2L -> "a b c", 9L -> "x y z")
    val out = DedupOps.exact(df).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(2L, 9L))
  }

  test("dedup_exact_normalized collapses case/whitespace variants, keeps lowest id") {
    val df = docs(
      5L -> "Hello  World",
      2L -> "hello world",
      3L -> " hello\tworld ",
      9L -> "different text")
    val out = DedupOps.exactNormalized(df).collect().map(_.getLong(0))
    assert(out.toSeq === Seq(2L, 9L))
    // plain exact keeps all four — the normalization is what merges them
    assert(DedupOps.exact(df).count() === 4)
  }

  test("dedup_exact_hash matches exact() on planted duplicates") {
    val df = docs(5L -> "a b c", 2L -> "a b c", 9L -> "x y z", 4L -> "a b c")
    val viaHash = DedupOps.exactByHash(df).collect().map(_.getLong(0)).toSeq
    val viaExact = DedupOps.exact(df).collect().map(_.getLong(0)).toSeq
    assert(viaHash === viaExact)
    assert(viaHash === Seq(2L, 9L))
  }

  test("dedup_exact_hash survives a mega-duplicated boilerplate text (1e5 copies)") {
    // the round-3 design built one collect_list array per hash group — a
    // 10⁵-fold duplicate would hold a 10⁵-element array in one aggregation
    // buffer. The row-shaped rewrite must (a) return the right answer and
    // (b) never plan a collect aggregate at all.
    val sess = spark
    import sess.implicits._
    val boiler = sess.range(10L, 100010L)
      .select(col("id").as("doc_id"), lit("error page not found").as("text"))
    val unique = Seq(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
      .toDF("doc_id", "text")
    val df = boiler.unionByName(unique)
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val kept = DedupOps.exactByHash(df).collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L, 2L, 10L))
  }

  test("ngramJaccard cap bounds boilerplate candidates without losing true near-dups") {
    // 60 unrelated docs all ending in the same boilerplate sentence, plus
    // one planted near-dup pair sharing many RARE shingles. Full-universe
    // semantics pairs every boilerplate doc with every other (1770
    // quadratic candidates — the 100 TB cliff in miniature); a df cap
    // below 60 drops the boilerplate shingles from the universe while the
    // rare-shingle pair still surfaces.
    val boilerTail = "all rights reserved contact us for details"
    val planted = (1 to 30).map(i => s"rare$i").mkString(" ")
    val rows =
      (1L to 60L).map(i => i -> s"unique${i}a unique${i}b unique${i}c $boilerTail") ++
        Seq(100L -> planted, 101L -> (planted + " tail"))
    val d = docs(rows: _*)
    // uncapped: boilerplate jaccard = 5/11 ≈ 0.45 ≥ tau → quadratic blowup
    assert(DedupOps.ngramJaccard(d, tau = 0.4, maxDf = Int.MaxValue).count() === 1771)
    // capped: only the true near-dup pair remains
    val out = DedupOps.ngramJaccard(d, tau = 0.4, maxDf = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((100L, 101L)))
  }

  test("dedup_near_minhash finds planted near-duplicates, skips unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "CHANGED" else s"token$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val out = DedupOps.nearMinhash(docs(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("ngramJaccard maxDf caps hot shingles; finite default finds real pairs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val dup = base + " extra"
    val df = docs(1L -> base, 2L -> dup)
    // near-dup pair found under the (finite) default cap
    assert(DedupOps.ngramJaccard(df, tau = 0.5).count() === 1)
    // every shared shingle has df=2 — a df cap of 1 suppresses the pair
    assert(DedupOps.ngramJaccard(df, tau = 0.5, maxDf = 1).count() === 0)
  }

  test("tokensBpe agrees with the oracle formula beyond ASCII (CJK/emoji/accents/marks)") {
    // the oracle re-expresses the lookaround split's piece count as
    // |alnum runs| + |non-alnum non-space chars|. At sf0.01 the corpus is
    // ASCII-ish; this pins the agreement on the unicode classes where the
    // two formulations could diverge: CJK (letters — a run with no spaces
    // is ONE piece), non-BMP emoji (one CODE POINT each, not two
    // surrogates), precomposed vs combining accents (combining marks are
    // \p{M}, not \p{L} — their own piece in both engines).
    val rows = Seq(
      1L -> "café naïve",          // precomposed accents: 2 runs
      2L -> "café latte",              // combining mark: cafe + ́ + latte = 3
      3L -> "日本語のテキスト", // CJK run, no spaces: 1
      4L -> "hello 👋 world 🌍!", // 2 runs + 👋 🌍 ! = 5
      5L -> "C'était 中文 test", // C + ' + était + 中文 + test = 5
      6L -> "１２３ abc")         // fullwidth digits are \p{N}: 2 runs
    val expectedByHand = Map(1L -> 2, 2L -> 3, 3L -> 1, 4L -> 5, 5L -> 5, 6L -> 2)
    // independent recomputation of the ORACLE's two-regex formula
    val runRe = java.util.regex.Pattern.compile("""[\p{L}\p{N}]+""")
    val loneRe = java.util.regex.Pattern.compile("""[^\p{L}\p{N} ]""")
    def oracleCount(s: String): Int = {
      def n(p: java.util.regex.Pattern) = {
        val m = p.matcher(s); var c = 0; while (m.find()) c += 1; c
      }
      n(runRe) + n(loneRe)
    }
    rows.foreach { case (id, s) =>
      assert(oracleCount(s) === expectedByHand(id),
        s"oracle formula disagrees with hand count for doc $id: '$s'")
    }
    val spark_ = TextOps.tokensBpe(docs(rows: _*))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(spark_ === expectedByHand)
  }

  test("dedup_simhash: identical texts get identical fingerprints, disjoint texts differ") {
    val df = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "completely different words here")
    val m = DedupOps.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
  }

  test("dedup_simhash_pairs finds planted near-duplicates, skips unrelated docs") {
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 13) "CHANGED" else s"token$i").mkString(" ")
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val out = DedupOps.simhashPairs(docs(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 2L)))
  }

  test("sim_ann_lsh_batch per-probe recall vs the exact batch sweep") {
    val emb = Tables.embeddings(spark, sf())
    val exact = VectorOps.batchCosineTopK(emb, nProbes = 3, k = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = VectorOps.annLshBatch(emb, nProbes = 3, k = 10)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    (0L until 3L).foreach { p =>
      val recall = (exact(p) intersect approx.getOrElse(p, Set.empty)).size.toDouble /
        exact(p).size
      assert(recall >= 0.5, s"probe $p recall = $recall")
    }
  }

  test("sim_batch_topk agrees with the single-probe exact top-k per probe") {
    val emb = Tables.embeddings(spark, sf())
    val batch = VectorOps.batchCosineTopK(emb, nProbes = 3, k = 5)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    (0L until 3L).foreach { p =>
      val single = VectorOps.cosineTopK(emb, probeId = p, k = 5)
        .collect().map(_.getLong(0)).toSeq
      assert(batch(p) === single, s"probe $p")
    }
  }

  test("dedup clusters: transitive chains collapse to one component, labeled by its min") {
    val sess = spark
    import sess.implicits._
    // 1~2, 2~3 but never 1~3 directly: only transitivity links them
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val out = DedupOps.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("text_fingerprint is deterministic and order-sensitive") {
    val df = docs(1L -> "a b c", 2L -> "a b c", 3L -> "c b a")
    val m = TextOps.fingerprint(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(m(1L) !== m(3L))
  }

  test("text_pii_scrub redacts emails/phones/long ids, leaves clean text untouched") {
    val df = docs(
      1L -> "contact me at jane.doe+spam@example.co.uk for details",
      2L -> "call +1 (555) 123-4567 or 555.987.6543 now",
      3L -> "account 1234567890123456 is overdrawn",
      4L -> "perfectly clean text with digits 42 and 2024")
    val m = TextOps.scrubPii(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "contact me at <EMAIL> for details")
    assert(m(2L).contains("<PHONE>") && !m(2L).exists(_.isDigit), m(2L))
    assert(m(3L) === "account <NUM> is overdrawn")
    assert(m(4L) === "perfectly clean text with digits 42 and 2024")
  }

  test("text_langid separates 8 languages on stopword-profile fixtures, 'und' when none") {
    // deliberately includes cross-language stopword collisions: es/fr
    // share "la"/"que", pt/nl share "de", en/nl share "is" — the larger
    // profiles must still separate them on aggregate hits
    val df = docs(
      1L -> "The cat and the dog is here but not for what it was",
      2L -> "el perro de la casa que ladra no es para las personas",
      3L -> "der hund ist nicht in dem haus und die katze war auch da",
      4L -> "le chien est dans la maison et les chats ne sont pas sur le toit",
      5L -> "il cane non è in casa ma sono sicuro che anche il gatto",
      6L -> "o cachorro não está em casa mas foi para o parque com os outros",
      7L -> "de hond is niet in het huis maar ook een kat bij de deur",
      8L -> "的 是 了 在 我 有 他 这 中 大",
      9L -> "qqq www eee rrr")
    val m = TextOps.langId(df).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr",
      5L -> "it", 6L -> "pt", 7L -> "nl", 8L -> "zh", 9L -> "und"))
  }

  test("sim_ann_lsh recall@10 vs exact brute force on real embeddings") {
    val emb = Tables.embeddings(spark, sf())
    val exact = VectorOps.cosineTopK(emb, probeId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = VectorOps.annLsh(emb, probeId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall (exact=$exact approx=$approx)")
  }

  test("dedup_near_embedding finds planted duplicate vectors only") {
    val emb = Tables.embeddings(spark, sf()).limit(50)
    // plant: vec 9000 = copy of vec 0 → cosine 1.0
    val planted = emb.union(
      emb.filter(col("vec_id") === 0).select(lit(9000L).as("vec_id"),
        col("embedding"), col("label")))
    val out = VectorOps.nearDupEmbedding(planted, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((0L, 9000L)))
  }

  test("fn_map builds and queries map columns") {
    val row = ScalarFns.fnMap(Tables.events(spark, sf())).limit(1).collect()(0)
    assert(row.getInt(3) === 2) // n_keys
    assert(Set("signup", "click", "purchase", "error", "view").contains(row.getString(1)))
  }

  test("agg_approx_distinct is within rsd of the exact count") {
    val ev = Tables.events(spark, sf())
    val approx = Aggs.approxDistinct(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)).toDouble / exact(k) <= 0.05,
        s"$k: approx=$a exact=${exact(k)}")
    }
  }

  test("sample_bottomk equals the exact k-smallest-hashes per group") {
    val li = Tables.lineitem(spark, sf())
    val sketch = Aggs.sampleBottomKSketch(li, k = 8).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val exact = li
      .select(col("l_returnflag"),
        conv(substring(md5(col("l_suppkey").cast("string")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).distinct.sorted.take(8).toSeq).toMap
    assert(sketch === exact)
  }

  test("agg_stats_approx percentiles land within 1% of the exact ones") {
    val orders = Tables.orders(spark, sf())
    val exact = Aggs.stats(orders).collect()(0)
    val approx = Aggs.statsApprox(orders).collect()(0)
    // same min/max/cnt; sketch percentiles within relative tolerance
    assert(approx.getDouble(0) === exact.getDouble(0))
    assert(approx.getDouble(1) === exact.getDouble(1))
    assert(approx.getLong(4) === exact.getLong(5))
    Seq(2 -> 3, 3 -> 4).foreach { case (ai, ei) =>
      val (a, e) = (approx.getDouble(ai), exact.getDouble(ei))
      assert(math.abs(a - e) / e <= 0.01, s"approx $a vs exact $e")
    }
  }

  test("text_tokens_bpe splits words and punctuation into pieces") {
    val df = docs(1L -> "hello, world! a-b")
    val n = TextOps.tokensBpe(df).collect()(0).getInt(1)
    // hello , world ! a - b → 7 pieces
    assert(n === 7)
  }

  test("text_dup_spans counts spans shared across documents, filter drops boilerplate") {
    val df = docs(
      1L -> "the quick brown fox jumps",   // trigrams: 3, shares "the quick brown" with doc 2
      2L -> "the quick brown cat sits",    // 3 trigrams, 1 shared
      3L -> "completely unrelated words here now") // 3 trigrams, 0 shared
    val prof = CorpusOps.dupSpans(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(prof(1L) === (3L, 1L))
    assert(prof(2L) === (3L, 1L))
    assert(prof(3L) === (3L, 0L))
    // maxFrac 0.3 drops the two docs with 1/3 of spans shared
    val kept = CorpusOps.filterDupSpans(df, maxFrac = 0.3).collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(3L))
    // short docs (no trigram) carry no signal and are kept
    val short = docs(7L -> "one two", 8L -> "one two")
    assert(CorpusOps.filterDupSpans(short).count() === 2)
  }

  test("sample_temperature keeps the smallest source whole and downsamples larger ones") {
    val sess = spark
    import sess.implicits._
    val rows =
      (1L to 10L).map(i => (i, s"small doc $i", "en", "tiny")) ++
      (100L to 400L).map(i => (i, s"big corpus document number $i with more text", "en", "huge"))
    val df = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = CorpusOps.sampleTemperature(df)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("tiny") === 10L) // min-bytes source: kept whole
    // rate for huge ≈ sqrt(b_tiny/b_huge) ≪ 1; allow sampling noise but
    // require a real reduction
    assert(out("huge") < 150L && out("huge") > 0L)
  }

  test("text_ppl_buckets is balanced per language and head-scores dominate tail-scores") {
    val df = Tables.documents(spark, sf())
    val out = CorpusOps.pplBuckets(df).cache()
    val sizes = out.groupBy("lang", "ppl_bucket").count().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2))).toMap
    sizes.values.foreach { s =>
      assert(s.max - s.min <= 1, s"ntile buckets must be balanced, got ${s.toSeq}")
    }
    val byBucket = out.groupBy("ppl_bucket").agg(avg("avg_freq")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byBucket(1) > byBucket(3), "head bucket must out-score the tail")
    out.unpersist()
  }

  test("corpus_funnel stages are sequential: removed counts sum, remaining is monotone") {
    // one doc per failure mode, in stage order, plus one clean survivor
    val df = docs(
      1L -> "too short",                                        // fails min_words
      2L -> Seq.fill(20)("a").mkString(" "),                    // 20 words, 39 chars: fails min_chars
      3L -> Seq.fill(16)("extraordinarily").mkString(" "),      // avg word len 15: fails band
      4L -> ("x y z " * 8 + "x y z"),                           // repeated trigrams
      5L -> (1 to 20).map(i => s"w$i").mkString(" "))           // clean survivor
    val rows = CorpusOps.corpusFunnel(df, minWords = 15, minChars = 50, maxAvgWordLen = 8.0)
      .collect()
    val remaining = rows.map(_.getLong(3))
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 1, 2, 3, 4))
    assert(remaining.zip(remaining.tail).forall { case (a, b) => b <= a })
    assert(rows.map(_.getLong(2)).sum === 5L - remaining.last)
  }
}
