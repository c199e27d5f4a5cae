package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-9 operators: the model-tier quality/PII scorer (the last
  * unstarted ROADMAP deferral — batched inference plumbing with a
  * deterministic integer model). */
class RoundNineOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("qualityModel: batched inference matches the closed-form column score") {
    // the mapPartitions batching must be a pure plumbing detail: any
    // batch size produces exactly the closed-form logit
    val sess = spark
    import sess.implicits._
    val expected = docs.select(
      col("doc_id"),
      (lit(2L) * size(filter(split(col("text"), " "), w => w =!= "")) +
        lit(5L) * size(filter(split(lower(col("text")), " "),
          w => w === "the" || w === "a" || w === "of" || w === "to")) +
        lit(-30L) * (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))) +
        lit(-1000L) * (regexp_count(col("text"),
          lit("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""")) +
          regexp_count(col("text"), lit("""\d{9,}"""))) +
        lit(-127L)).cast("long").as("logit"))
      .as[(Long, Long)].collect().toMap
    Seq(1, 7, 256, 100000).foreach { bs =>
      val got = TextOps.qualityModel(docs, batchSize = bs)
        .select("doc_id", "logit").as[(Long, Long)].collect().toMap
      assert(got == expected, s"batchSize=$bs diverged from closed form")
    }
  }

  test("qualityModel: planted PII and digit-heavy docs are dropped; prose kept") {
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      // natural prose: many words + stopwords, no digits — keep
      (1L, ("the quick brown fox jumps over the lazy dog and runs to " +
        "the river of a thousand winding paths ") * 4),
      // same prose with one email: the -1000 PII weight must sink it
      (2L, ("the quick brown fox jumps over the lazy dog and runs to " +
        "the river of a thousand winding paths ") * 4 +
        "contact me at fox.hunter@example.com"),
      // digit table: -30/digit buries the word score — drop
      (3L, "row 1234 5678 24 68 13 57 90 " * 8),
      // long id run counts as PII (card/id shaped) AND digits — drop
      (4L, "the order of the day is a big number 98765432109876 to note")
    ).toDF("doc_id", "text")
    val out = TextOps.qualityModel(planted).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "keep", "clean prose must be kept")
    assert(out(2L) == "drop", "an email must sink an otherwise-keep doc")
    assert(out(3L) == "drop", "digit-heavy doc must drop")
    assert(out(4L) == "drop", "long id run must drop")
  }

  test("gopherQuality: each rule flips on its planted violation; clean prose passes") {
    val sess = spark
    import sess.implicits._
    val prose = ("the cat sat with a friend and told of days that have been " +
      "good to all of them here ") * 3 // 60+ words, stopword-rich, alphabetic
    val planted = Seq(
      (1L, prose), // passes every rule
      (2L, "short doc of the few"), // < 50 words
      (3L, ("a " * 60).trim), // mean word length 1 < 3
      (4L, prose + " " + ("#" * 1) * 20 + (" #" * 20)), // symbol ratio
      (5L, prose.replaceAll("[a-z]", "7")), // no alphabetic words, no stopwords
      (6L, ("zebra quagga okapi tapir bongo dikdik gerenuk kudu eland nyala " * 6).trim)
      // 60 words, alphabetic, mean len fine — but ZERO stopwords
    ).toDF("doc_id", "text")
    val out = TextOps.gopherQuality(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("keep") == 1, "clean prose must pass the gate")
    assert(out(2L).getAs[Int]("r_wordcount") == 0)
    assert(out(3L).getAs[Int]("r_meanwordlen") == 0)
    assert(out(4L).getAs[Int]("r_symbolratio") == 0)
    assert(out(5L).getAs[Int]("r_alphafrac") == 0)
    assert(out(5L).getAs[Int]("r_stopwords") == 0)
    assert(out(6L).getAs[Int]("r_stopwords") == 0)
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(out(id).getAs[Int]("keep") == 0, s"doc $id must fail the gate"))
  }

  test("repetitionStats: stuffed bigram flags; varied text does not") {
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      (1L, "buy gold " * 30 + "today"), // one bigram dominates
      (2L, "the quick brown fox jumps over a lazy dog near the old river bank")
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(planted).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("top_bigram") == "buy gold")
    assert(out(1L).getAs[Int]("repetitive") == 1,
      s"stuffed doc not flagged: ${out(1L)}")
    assert(out(2L).getAs[Int]("repetitive") == 0,
      s"varied doc wrongly flagged: ${out(2L)}")
    // coverage is exact integer micro units: recompute doc 1 by hand —
    // "buy gold" appears 30 times (the interleaved "gold buy" 29); top
    // count 30, gram chars = 3+4 (length minus the joining space), word
    // chars = 30*3 + 30*4 + 5 ("today") = 215
    assert(out(1L).getAs[Long]("cnt") == 30L)
    assert(out(1L).getAs[Long]("cover_micro") ==
      30L * 7L * 1000000L / (30 * 3 + 30 * 4 + 5))
  }

  test("bloomShardFlags: no false negatives on planted cross-shard dups; FP bounded") {
    val sess = spark
    import sess.implicits._
    // 8 planted duplicates crossing the even/odd split + 400 unique docs
    val dups = (0 until 8).flatMap { i =>
      val t = s"planted duplicate number $i crossing the shard split boundary"
      Seq((2L * i, t), (2L * i + 1, t)) // even=corpus copy, odd=shard copy
    }
    val uniques = (100 until 500).map(i => (i.toLong, s"unique document text $i " * 3))
    val docs = (dups ++ uniques).toDF("doc_id", "text")
    val flags = DedupOps.bloomShardFlags(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // zero false negatives: every odd-side planted dup must flag
    (0 until 8).foreach(i => assert(flags(2L * i + 1) == 1,
      s"planted cross-shard dup ${2 * i + 1} missed — Bloom false negative"))
    // exact ground truth: an anti-join agrees on every UNFLAGGED doc
    // (flagged-but-not-dup is an allowed false positive; missed-dup is not)
    val truth = docs.filter($"doc_id" % 2 === 1).as("b")
      .join(docs.filter($"doc_id" % 2 === 0).as("a"), $"a.text" === $"b.text", "left_semi")
      .select($"doc_id").as[Long].collect().toSet
    truth.foreach(id => assert(flags(id) == 1, s"true dup $id unflagged"))
    // FP rate at m=2^20, k=5, n≈208: theory ~(1-e^(-kn/m))^k ≈ 1e-15 —
    // assert simply that false positives are rare (≤ 2 of ~400)
    val fps = flags.count { case (id, f) => f == 1 && !truth.contains(id) }
    assert(fps <= 2, s"$fps false positives out of ${flags.size} — probe math broken")
  }

  test("bloomShardFlags: small-m FP rate stays near theory (probe independence)") {
    val sess = spark
    import sess.implicits._
    // deliberately undersized filter: m=1024 bits, k=3, n=300 corpus keys
    // → p_bit = 1-e^(-900/1024) ≈ 0.585, FP ≈ 0.20. A broken probe
    // derivation (correlated positions) sends this toward p_bit ≈ 0.59.
    val docs = ((0 until 600).map(i => (2L * i, s"corpus doc $i")) ++
      (0 until 300).map(i => (2L * i + 1, s"shard doc $i"))).toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 2 === 0).limit(300)
    val all = corpus.unionByName(docs.filter($"doc_id" % 2 === 1))
    val flags = DedupOps.bloomShardFlags(all, bitsLog2 = 10, k = 3).collect()
    val fpRate = flags.count(_.getInt(1) == 1).toDouble / flags.length
    assert(fpRate < 0.35, f"FP rate $fpRate%.3f far above the ~0.20 theory bound")
  }

  test("softDedupWeights: exact group sizes, floor-division micro weights") {
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      (1L, "unique one"), (2L, "dup text"), (3L, "dup text"),
      (4L, "tri text"), (5L, "tri text"), (6L, "tri text")
    ).toDF("doc_id", "text")
    val out = DedupOps.softDedupWeights(planted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 1000000L))
    assert(out(2L) == (2L, 500000L) && out(3L) == (2L, 500000L))
    Seq(4L, 5L, 6L).foreach(id => assert(out(id) == (3L, 333333L))) // floor
  }

  test("dsirWeights: target-like docs score above source-only docs") {
    val sess = spark
    import sess.implicits._
    // target (en) vocabulary is disjoint from the rest: a doc written in
    // the target's words must get a HIGHER importance weight than a doc
    // of source-only words — the whole point of the estimator
    val enWords = "alpha beta gamma delta epsilon zeta eta theta"
    val deWords = "eins zwei drei vier fuenf sechs sieben acht"
    val docs = ((1 to 10).map(i => (i.toLong, enWords, "en")) ++
      (11 to 30).map(i => (i.toLong, deWords, "de")) :+
      (31L, enWords, "fr") :+ // target-LIKE doc outside the target slice
      (32L, deWords, "fr")).toDF("doc_id", "text", "lang")
    val w = CorpusOps.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(31L) > w(32L),
      s"target-like doc must outscore source-only doc: ${w(31L)} <= ${w(32L)}")
    assert(w(31L) > 0 && w(32L) < 0,
      s"signs must separate in/out of domain: ${w(31L)}, ${w(32L)}")
  }

  test("hllShardDistinct: estimates near exact; union merges disjoint shards") {
    val sess = spark
    import sess.implicits._
    // disjoint 400-word vocabularies per lang: per-shard estimate must
    // sit near 400 and the merged global near 800 (HLL lgK=12 relative
    // error ~1.6%; allow 5%)
    val docs = ((0 until 40).map(i =>
      (i.toLong, (i * 10 until i * 10 + 10).map(j => s"en$j").mkString(" "), "en")) ++
      (40 until 80).map(i =>
        (i.toLong, ((i - 40) * 10 until (i - 40) * 10 + 10).map(j => s"de$j").mkString(" "), "de")))
      .toDF("doc_id", "text", "lang")
    val est = CorpusOps.hllShardDistinct(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    assert(math.abs(est("en") - 400) / 400.0 < 0.05, s"en: ${est("en")}")
    assert(math.abs(est("de") - 400) / 400.0 < 0.05, s"de: ${est("de")}")
    assert(math.abs(est("__all__") - 800) / 800.0 < 0.05, s"all: ${est("__all__")}")
    assert(est("__all__") >= est("en") && est("__all__") >= est("de"),
      "the union must dominate every shard")
  }

  test("sessionize: gaps cut sessions exactly at the threshold; one window pass") {
    val sess = spark
    import sess.implicits._
    val base = 1704067200L
    val planted = Seq(
      // user 7: gap exactly 1800 (SAME session — cut is strictly >),
      // then 1801 (new session)
      (1L, 7L, base), (2L, 7L, base + 1800), (3L, 7L, base + 1800 + 1801),
      // user 8: everything inside one session
      (4L, 8L, base), (5L, 8L, base + 10), (6L, 8L, base + 20)
    ).map { case (e, u, s) => (e, u, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(s))) }
      .toDF("event_id", "user_id", "ts")
      .withColumn("event_type", lit("t")).withColumn("value", lit(0.0))
      .withColumn("props", lit("{}"))
    val out = StreamBatchOps.sessionize(planted).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap // event_id -> session_seq
    assert(out(1L) == 1L && out(2L) == 1L, "a gap of exactly 1800 must NOT cut")
    assert(out(3L) == 2L, "a gap of 1801 must open session 2")
    assert(out(4L) == 1L && out(5L) == 1L && out(6L) == 1L)
    // both windows (lag + running sum) must share ONE sort/window pass
    val exec = StreamBatchOps.sessionize(planted).queryExecution.executedPlan.treeString
    assert("Window\\b".r.findAllIn(exec).size <= 2 &&
      "Exchange".r.findAllIn(exec).size <= 2, // user shuffle + display sort
      s"sessionize should share one user-keyed sort:\n$exec")
  }

  private def eventsFrom(rows: Seq[(Long, Long, String, Long)]) = {
    val sess = spark
    import sess.implicits._
    rows.map { case (e, u, ty, s) => (e, u, ty, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(s))) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
  }

  test("retention: cohorts by first day, offset-0 cell IS the cohort size") {
    val day = 86400L
    val base = 1704067200L // a midnight: day boundaries land cleanly
    val planted = eventsFrom(Seq(
      // cohort day0: users 1,2,3; user 1 active d0+d1+d2, user 2 d0+d2,
      // user 3 only d0 (two events same day — must count once)
      (1L, 1L, "view", base), (2L, 1L, "view", base + day),
      (3L, 1L, "view", base + 2 * day),
      (4L, 2L, "view", base + 10), (5L, 2L, "view", base + 2 * day + 10),
      (6L, 3L, "view", base + 20), (7L, 3L, "click", base + 30),
      // cohort day1: user 4 active d1 only
      (8L, 4L, "view", base + day + 40)))
    val out = StreamBatchOps.retention(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val d0 = base / day
    assert(out((d0, 0L)) == ((3L, 3L, 1.0)), "cohort d0 day 0: all 3 users")
    assert(out((d0, 1L)) == ((1L, 3L, 0.333333)), "d0+1: only user 1")
    assert(out((d0, 2L)) == ((2L, 3L, 0.666667)), "d0+2: users 1 and 2")
    assert(out((d0 + 1, 0L)) == ((1L, 1L, 1.0)), "cohort d1: user 4")
    assert(!out.contains((d0, 3L)), "no phantom cells")
    // one user_id exchange shared by the min-agg / distinct / join chain
    val exec = StreamBatchOps.retention(planted)
      .queryExecution.executedPlan.treeString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(exec).size <= 1,
      s"retention should reuse ONE user_id partitioning:\n$exec")
  }

  test("funnelSteps: ordered within-budget sequences only; share vs step 1") {
    val planted = eventsFrom(Seq(
      // user 1: full funnel inside the budget
      (1L, 1L, "view", 1000L), (2L, 1L, "click", 2000L),
      (3L, 1L, "purchase", 3000L),
      // user 2: click BEFORE the first view — never reaches step 2
      (4L, 2L, "click", 1000L), (5L, 2L, "view", 2000L),
      // user 3: click in budget, purchase 1s past the 24h budget
      (6L, 3L, "view", 1000L), (7L, 3L, "click", 2000L),
      (8L, 3L, "purchase", 2000L + 86401L),
      // user 4: purchase with no view/click at all — not even step 1
      (9L, 4L, "purchase", 1000L)))
    val out = StreamBatchOps.funnelSteps(planted).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out("view") == ((3L, 1.0)), "users 1,2,3 enter the funnel")
    assert(out("click") == ((2L, 0.666667)), "users 1,3 click after view")
    assert(out("purchase") == ((1L, 0.333333)), "only user 1 completes")
  }

  test("funnelSteps: boundary — a same-second next step and an exactly-at-budget step count") {
    val planted = eventsFrom(Seq(
      (1L, 1L, "view", 5000L),
      (2L, 1L, "click", 5000L),              // same second as the view
      (3L, 1L, "purchase", 5000L + 86400L))) // exactly at the budget edge
    val out = StreamBatchOps.funnelSteps(planted).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("view") == 1L && out("click") == 1L && out("purchase") == 1L,
      "at-or-after and ≤budget are both inclusive")
  }

  test("repeatEpochs: factors are ceil(max/toks) capped at 4; epochs enumerate") {
    val sess = spark
    import sess.implicits._
    // big: 100 tokens; mid: 40 → ceil(100/40)=3; tiny: 10 → ceil=10, cap 4
    val planted = Seq(
      (1L, ("w " * 60).trim, "big"), (2L, ("w " * 40).trim, "big"),
      (3L, ("w " * 40).trim, "mid"),
      (4L, ("w " * 10).trim, "tiny")).toDF("doc_id", "text", "source")
    val out = CorpusOps.repeatEpochs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> r.getLong(3)).toMap
    assert(out.keys.count(_._1 == 1L) == 1, "largest source: 1 epoch")
    assert(out((3L, 1L)) == 3L && out.contains((3L, 3L)) &&
      !out.contains((3L, 4L)), "mid source: exactly 3 epochs")
    assert(out((4L, 1L)) == 4L && out.contains((4L, 4L)) &&
      !out.contains((4L, 5L)), "tiny source: capped at 4 epochs")
    // epochs are dense 1..n per doc
    assert(out.keys.filter(_._1 == 4L).map(_._2).toSet == Set(1L, 2L, 3L, 4L))
    // the corpus itself is never hash-shuffled: only the per-source agg
    // exchanges rows (O(sources)), the factor table comes back by
    // broadcast, and the emit is a map-side explode
    val exec = CorpusOps.repeatEpochs(planted)
      .queryExecution.executedPlan.treeString
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(exec).isEmpty,
      s"repeatEpochs must not shuffle doc-grain rows:\n$exec")
    assert(exec.contains("BroadcastExchange"),
      s"factor table should broadcast:\n$exec")
  }

  test("knBigram: hand-computed KN probabilities; contexts sum to 1") {
    val sess = spark
    import sess.implicits._
    // bigrams: (a,b)x2, (a,c)x1, (d,b)x1 — T=3 types
    // P(b|a) = (2-.75)/3 + (.75*2)/3*(2/3) = 0.75
    // P(c|a) = (1-.75)/3 + (.75*2)/3*(1/3) = 0.25
    // P(b|d) = (1-.75)/1 + (.75*1)/1*(2/3) = 0.75
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b"))
      .toDF("doc_id", "text")
    val out = TextOps.knBigram(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(out(("a", "b")) == 0.75, s"P(b|a): ${out(("a", "b"))}")
    assert(out(("a", "c")) == 0.25, s"P(c|a): ${out(("a", "c"))}")
    assert(out(("d", "b")) == 0.75, s"P(b|d): ${out(("d", "b"))}")
    // interpolated KN is a proper distribution over the FULL
    // continuation vocabulary: context 'a' observes continuations whose
    // P_cont shares cover all of it (b: 2/3, c: 1/3), so its observed
    // probabilities must sum to exactly 1; context 'd' observes only b,
    // so its sum is short by exactly lambda(d) x P_cont(c)
    // = 0.75 x 1/3 = 0.25
    val byCtx = out.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    assert(math.abs(byCtx("a") - 1.0) < 1e-6,
      s"context 'a' covers the continuation vocab; sums to ${byCtx("a")}")
    assert(math.abs(byCtx("d") - 0.75) < 1e-6,
      s"context 'd' misses P_cont(c) mass: ${byCtx("d")}")
    // frequency alone must not win: b after d is as probable as b after a
    // DESPITE c(d,b)=1 vs c(a,b)=2 — the continuation term at work
    assert(out(("d", "b")) == out(("a", "b")))
  }

  test("dimStats: exact mean/variance per dimension") {
    val sess = spark
    import sess.implicits._
    val vecs = Seq((1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = VectorOps.dimStats(vecs).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(out(0) == ((2L, 2.0, 1.0)), s"dim0: ${out(0)}")
    assert(out(1) == ((2L, 3.0, 1.0)), s"dim1: ${out(1)}")
  }

  test("runningDistinct: breadth counts; revisits don't bump; ONE user exchange") {
    val planted = eventsFrom(Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "view", 200L),   // revisit: still 1
      (3L, 1L, "click", 300L),                          // breadth 2
      (4L, 1L, "view", 400L),                           // revisit: still 2
      (5L, 1L, "purchase", 500L),                       // breadth 3
      (6L, 2L, "error", 100L)))                         // other user: own count
    val df = graft.operators.Windows.runningDistinct(planted)
    val got = df.collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 3L, 6L -> 1L))
    // HashPartitioning(user_id) satisfies the (user_id, event_type)
    // window's clustered distribution, so both windows ride ONE exchange
    // (AQE treeString repeats the pre-adaptive plan under "Initial Plan"
    // — count only the final section)
    val tree = df.queryExecution.executedPlan.treeString
    val exec = tree.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(exec).size <= 1,
      s"both windows must share the user_id exchange:\n$exec")
  }

  test("pagerank: hubs outrank leaves, symmetry holds, mass is conserved") {
    val sess = spark
    import sess.implicits._
    // c1 buys from s1,s2,s3; c2 buys from s1 only → degrees:
    // c1=3, s1=2, c2=s2=s3=1; s1 bridges both customers
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 1L), (11L, 2L), (12L, 3L), (13L, 1L))
      .toDF("l_orderkey", "l_suppkey")
    val out = GraphOps.pagerank(orders, li).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out(("customer", 1L)) > out(("customer", 2L)),
      "the 3-degree customer must outrank the 1-degree one")
    assert(out(("supplier", 1L)) > out(("supplier", 2L)),
      "the bridging supplier must outrank a leaf supplier")
    assert(out(("supplier", 2L)) == out(("supplier", 3L)),
      "structurally symmetric nodes must tie exactly")
    // integer-floor leak is bounded: < 1 micro-unit per division, a few
    // divisions per node per iteration on this 5-node graph
    val mass = out.values.sum
    assert(mass <= 1000000000000L && mass > 999999999000L,
      s"rank mass must be conserved up to floor leak: $mass")
  }

  test("madOutliers: catches the double spike the sigma test masks") {
    val base = 1704067200L
    val counts = Seq(8, 9, 10, 10, 11, 12, 10, 40, 9, 38, 11, 10)
    var eid = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map { _ => eid += 1; (eid, 7L, "a", base + h * 3600L) }
    }
    val planted = eventsFrom(rows)
    // med = 10, MAD = 1: only the 40 and 38 hours flag (adev 30, 28);
    // ordinary jitter (adev <= 2) stays quiet
    val out = StreamBatchOps.madOutliers(planted).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet == Set(base + 7 * 3600L, base + 9 * 3600L),
      s"exactly the two burst hours: ${out.keySet}")
    assert(out.values.forall { case (_, med, mad) => med == 10L && mad == 1L })
    // the masking story: TWO spikes inflate sigma enough that the
    // 3-sigma z-test (ts_anomaly) flags NEITHER — the robust pair does
    val z = StreamBatchOps.anomaly(planted).collect()
    assert(z.isEmpty,
      s"sigma test should be masked by the double spike, got ${z.length}")
  }

  test("moments: hand-computed skewness/kurtosis from exact power sums") {
    val base = 1704067200L
    // hourly counts [1,1,1,5]: mu=2, m2=3, m3=6, m4=21
    // skew = 6/(3*sqrt(3)) = 1.154701, excess kurt = 21/9 - 3 = -0.666667
    val counts = Seq(1, 1, 1, 5)
    var eid = 0L
    val planted = eventsFrom(counts.zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map { _ => eid += 1; (eid, 1L, "a", base + h * 3600L) }
    })
    val r = StreamBatchOps.moments(planted).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 4L && row.getDouble(2) == 2.0 &&
      row.getDouble(3) == 3.0)
    assert(row.getDouble(4) == 1.154701, s"skew: ${row.getDouble(4)}")
    assert(row.getDouble(5) == -0.666667, s"kurt: ${row.getDouble(5)}")
  }

  test("bpeMerges: textbook low/lower/newest/widest learns the exact 5-merge sequence") {
    val sess = spark
    import sess.implicits._
    // Sennrich et al. 2016's example vocabulary, as a corpus with the
    // frequencies as repetition counts
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val got = CorpusOps.bpeMerges(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    // hand-derived with the (cnt desc, l, r) tie-break:
    // es(9) ties st(9) -> (e,s); then (es,t)=9; lo(7) ties ow(7) ->
    // (l,o); then (lo,w)=7; then the 6-count tie (e,w)/(n,e)/(w,est)
    // breaks to (e,w)
    val want = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L),
      (5, "e", "w", "ew", 6L))
    assert(got.toSeq == want, s"got: ${got.toSeq}")
  }

  test("bpeMerges: chained identical-pair merges are leftmost non-overlapping") {
    val sess = spark
    import sess.implicits._
    // "aaaa" with top pair (a,a): leftmost-first gives (aa)(aa), so
    // iteration 2's top pair must be (aa,aa) — a fold that let the
    // merged symbol immediately re-merge would produce (aaa)a instead
    val docs = Seq((1L, "aaaa aaaa ab")).toDF("doc_id", "text")
    val got = CorpusOps.bpeMerges(docs, merges = 2).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got(0) == (("a", "a", 6L)), s"iter1: ${got(0)}") // 3+3 in aaaa x2? see below
    assert(got(1) == (("aa", "aa", 2L)), s"iter2: ${got(1)}")
  }

  test("qualityModel: map-only plan — no shuffle before the display sort") {
    val plan = TextOps.qualityModel(docs).queryExecution.optimizedPlan.toString
    // exactly one Sort (the final orderBy) and no Aggregate/Join anywhere;
    // inference is mapPartitions over projected vectors, the corpus text
    // never crosses a stage boundary
    assert(!plan.contains("Join") && !plan.contains("Aggregate"),
      s"qualityModel should be map-only:\n$plan")
    val exec = TextOps.qualityModel(docs).queryExecution.executedPlan.treeString
    assert("Exchange".r.findAllIn(exec).size <= 1, // the global sort only
      s"unexpected shuffles in qualityModel:\n$exec")
  }
}
