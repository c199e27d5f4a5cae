package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Hand-computed semantic pins for the round-11 oracled wave. The
  * DuckDB oracle proves cross-engine agreement at sf0.01; these prove
  * the SEMANTICS are the intended ones on fixtures small enough to
  * verify on paper.
  */
class RoundElevenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("graph_components: two planted components collapse to the size histogram") {
    // orders 10,11 each ship {1,2,3} (support-2 triangle → one
    // component of 3); orders 20,21 ship {8,9} (one component of 2);
    // order 30 ships {3,8} ONCE — below support, must not merge them
    val li = (Seq(10L, 11L).flatMap(o => Seq(1L, 2L, 3L).map((o, _))) ++
      Seq(20L, 21L).flatMap(o => Seq(8L, 9L).map((o, _))) ++
      Seq((30L, 3L), (30L, 8L)))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphOps.components(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((2L, 1L, 8L), (3L, 1L, 1L)))
  }

  test("graph_components: driver union-find and the pointer-jump tier agree") {
    // maxDriverEdges = 0 forces the DedupOps.clusters tier on the same
    // fixture — identical histogram proves tier equivalence (same
    // min-reachable labels, so even min_component matches)
    val li = (Seq(10L, 11L).flatMap(o => Seq(1L, 2L, 3L).map((o, _))) ++
      Seq(20L, 21L).flatMap(o => Seq(8L, 9L).map((o, _))))
      .toDF("l_orderkey", "l_partkey")
    val viaLoop = GraphOps.components(li, maxDriverEdges = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(viaLoop.toSeq == Seq((2L, 1L, 8L), (3L, 1L, 1L)))
  }

  test("graph_components: the pair plan scans the corpus exactly once (the scaladoc claim)") {
    // the result frame reads clusters' label checkpoint, which the
    // PlanGuardSpec pin-origin walk cannot attribute — so the 1-scan
    // claim is asserted here on the pair plan itself (the r15 basket
    // aggregate = one honest lineitem scan, the same floor triangles is
    // guarded at; the r6-r14 self-join form cost two);
    // conf-off clone: the projection cache defaults ON since r14 and
    // would make the plan scan the cache parquet instead
    val sOff = spark.newSession()
    sOff.conf.set(GraphProjectionCache.ConfKey, "false")
    val pairs = GraphOps.coPurchaseEdges(Tables.lineitem(sOff, sf()), 2)
    val scans = pairs.queryExecution.executedPlan.treeString
      .linesIterator.count(l =>
        l.contains("FileScan") && l.contains("lineitem.parquet"))
    // r19: back to ONE static scan — pairSupport is a single streaming
    // pipeline over one exchange (in-partition sort + lag dedup +
    // collect_list basket window + positional posexplode fan), no
    // self-join, so the corpus appears exactly once in the static plan
    // (PlanGuardSpec's graph_triangles note tracks the same move)
    assert(scans == 1, s"expected 1 static lineitem scan, got $scans")
  }

  test("ts_interp_linear: up-slope gap takes the straight line") {
    // type a: n=2 at h0, n=8 at h0+3h → gaps at +1h/+2h interpolate to
    // 4e6 and 6e6 micro-units ((8−2)·k·10⁶ // 3 steps)
    val ev = Seq((1L, "2024-01-01 00:10:00", "a", 1.0),
      (2L, "2024-01-01 00:20:00", "a", 1.0),
      (3L, "2024-01-01 03:00:00", "a", 1.0)).flatMap {
      case (id, ts, t, v) => Seq((id, ts, t, v))
    } ++ (10L to 16L).map(i => (i, "2024-01-01 03:05:00", "a", 1.0))
    val df = ev.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = StreamBatchOps.interpLinear(df).collect()
      .map(r => (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3)))
    val h0 = out.head._1
    assert(out.toSeq == Seq(
      (h0, 2L, 2000000L),
      (h0 + 3600, -1L, 4000000L),
      (h0 + 7200, -1L, 6000000L),
      (h0 + 10800, 8L, 8000000L)))
  }

  test("ts_interp_linear: down-slope gap truncates toward zero like DuckDB's //") {
    // n=5 at h0, n=1 at h0+3h: gap values 5e6 + (−4e6·k)//3 =
    // 3666667 (k=1), 2333334 (k=2) — trunc, NOT floor (…666 / …333)
    val rows = (1L to 5L).map(i => (i, "2024-01-01 00:30:00", "a", 1.0)) :+
      (9L, "2024-01-01 03:30:00", "a", 1.0)
    val df = rows.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = StreamBatchOps.interpLinear(df).collect().map(_.getLong(3))
    assert(out.toSeq == Seq(5000000L, 3666667L, 2333334L, 1000000L))
  }

  test("ts_ohlc_bars: open/close follow event_id order, high/low the values") {
    val ev = Seq((1L, "2024-01-01 05:10:00", "a", 10.50),
      (2L, "2024-01-01 05:20:00", "a", 9.25),
      (3L, "2024-01-01 05:30:00", "a", 11.00),
      (4L, "2024-01-01 06:10:00", "a", 7.77))
      .toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = StreamBatchOps.ohlcBars(ev).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)))
    assert(out.toSeq == Seq(
      (3L, 1050L, 1100L, 925L, 1100L),
      (1L, 777L, 777L, 777L, 777L)))
  }

  test("agg_linreg: a perfect line recovers slope and intercept exactly") {
    // y = 300 + 2x cents at x ∈ {0, 100, 200} seconds past the origin
    // → slope_nano = 2·10⁹, intercept_cents = 300
    val ev = Seq((1L, 0L, 3.00), (2L, 100L, 5.00), (3L, 200L, 7.00))
      .toDF("event_id", "x", "value")
      .select(col("event_id"),
        timestamp_seconds(col("x") + 1704067200L).as("ts"),
        lit("a").as("event_type"), col("value"))
    val r = Aggs.linreg(ev).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (3L, 2000000000L, 300L))
  }

  test("agg_linreg: negative slope truncates toward zero on both engines") {
    // y = 1000 − x cents at x ∈ {0, 3}: slope = −1 cent/s exactly;
    // then x ∈ {0, 3} with y {1000, 998}: slope −2/3 → nano −666666666
    val ev = Seq((1L, 0L, 10.00), (2L, 3L, 9.98))
      .toDF("event_id", "x", "value")
      .select(col("event_id"),
        timestamp_seconds(col("x") + 1704067200L).as("ts"),
        lit("a").as("event_type"), col("value"))
    val r = Aggs.linreg(ev).collect()(0)
    assert(r.getLong(2) == -666666666L, s"got ${r.getLong(2)}")
    assert(r.getLong(3) == 1000L)
  }

  test("agg_weighted_median: quantity weight shifts the median to the heavy row") {
    // prices 1,2,3 with weights 1,1,5: cumw 1,2,7; first price with
    // 2·cumw ≥ 7 is 3.0 (unweighted median would be 2.0)
    val li = Seq(("A", 1.0, 10L, 1, 1.0), ("A", 2.0, 11L, 1, 1.0),
      ("A", 3.0, 12L, 1, 5.0), ("R", 4.0, 13L, 1, 2.0))
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber", "l_quantity")
    val out = Aggs.weightedMedian(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("A", 7L, 3.0), ("R", 2L, 4.0)))
  }

  test("scan_csv: the serde round-trip is lossless for long/string/double") {
    val ev = Seq((42L, "click", 490.02), (7L, "view", 0.01))
      .toDF("event_id", "event_type", "value")
    val out = Scans.scanCsv(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((7L, "view", 0.01), (42L, "click", 490.02)))
  }

  test("fn_url: parse_url decomposes the synthesized URL into the known parts") {
    val docs = Seq((7L, "hello", "en", "srcA", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = ScalarFns.fnUrl(docs).collect()(0)
    assert(r.getString(1) == "https://srcA.example.org/en/doc/7?id=7&lang=en")
    assert(r.getString(2) == "srcA.example.org")
    assert(r.getString(3) == "/en/doc/7")
    assert(r.getString(4) == "id=7&lang=en")
    assert(r.getString(5) == "en")
  }

  test("ts_rolling_slope: a linear hourly ramp recovers its slope per window") {
    // counts 1,2,3,4 at consecutive hours: every full window's OLS
    // slope is exactly 1 count/hour = 1/3600 counts/sec → 277777 nano
    // (trunc); the first window (k=1) has den 0 → NULL
    val rows = (0 until 4).flatMap { h =>
      (0 to h).map(i => ((h * 10 + i).toLong,
        f"2024-01-01 0$h%d:30:00", "a", 1.0))
    }
    val df = rows.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = StreamBatchOps.rollingSlope(df).collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(out.toSeq == Seq(
      (1L, None), (2L, Some(277777L)), (3L, Some(277777L)),
      (4L, Some(277777L))))
  }

  test("graph_jaccard_links: predicts the missing edge of a near-clique first") {
    // square 1-2-3-4-1 (support 2 each): diagonals (1,3) and (2,4) are
    // the non-edges, each with 2 common neighbors and degree 2+2 →
    // J = 2/(2+2−2) = 1.0; no other candidate pair exists
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val li = square.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(10L + i * 2, 11L + i * 2).flatMap(o => Seq((o, a), (o, b)))
    }.toDF("l_orderkey", "l_partkey")
    val out = GraphOps.jaccardLinks(li).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.toSeq == Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("graph_jaccard_links: existing edges never appear as predictions") {
    // triangle {1,2,3}: every candidate pair is already an edge → empty
    val li = Seq(10L, 11L).flatMap(o => Seq(1L, 2L, 3L).map((o, _)))
      .toDF("l_orderkey", "l_partkey")
    assert(GraphOps.jaccardLinks(li).collect().isEmpty)
  }

  test("emb_dim_quantiles: exact rank selection on a known value ladder") {
    // dim 0: 0.01..1.00 → p01 = rank 1 = 0.01, p50 = rank 50 = 0.50,
    // p99 = rank 99 = 0.99; dim 1: −0.50..0.49 → −0.50, −0.01, 0.48
    // (exercises trunc-div bucketing around zero)
    val rows = (0 until 100).map { i =>
      (i.toLong, Array(((i + 1) / 100.0).toFloat, ((i - 50) / 100.0).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = VectorOps.dimQuantiles(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq(
      (0, 100L, 100000L, 5000000L, 9900000L),
      (1, 100L, -5000000L, -100000L, 4800000L)))
  }

  test("ts_streaks: islands split on the gap and the longest tie takes the earliest start") {
    // type a over 6 hours, counts 5,5,1,5,5,1 (mean 3.67): elevated
    // hours {0,1,3,4} → two streaks of 2; tie → earliest start wins
    val rows = Seq(0, 1, 3, 4).flatMap(h =>
      (1 to 5).map(i => ((h * 10 + i).toLong, f"2024-01-01 0$h%d:15:00", "a", 1.0))) ++
      Seq(2, 5).map(h => ((h * 10).toLong, f"2024-01-01 0$h%d:15:00", "a", 1.0))
    val df = rows.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val r = StreamBatchOps.streaks(df).collect()(0)
    val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == (4L, 2L, 2L, h0))
  }

  test("sink_partitioned: the round-trip aggregates equal the source's") {
    val docs = Seq((1L, "a.", "en", "s0", 2L), (2L, "b.", "en", "s0", 5L),
      (3L, "c.", "de", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-spec")
      .toString + "/out"
    val out = Scans.sinkPartitioned(docs, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("de", 1L, 7L, 3L), ("en", 2L, 7L, 3L)))
    // the sink really is hive-partitioned by lang
    val d = new java.io.File(dir)
    assert(d.listFiles().map(_.getName).toSet
      .intersect(Set("lang=en", "lang=de")).size == 2)
  }

  test("pipeline_sft_format: prefix becomes the prompt, budget gates") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "a b c d e f", "en", "s", 1L),   // 6 words: over budget 5
      (2L, "x y z", "en", "s", 1L),          // 3 words: too short, drops
      (3L, "p q r s", "en", "s", 1L))        // 4 words: fits
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.sftFormat(docs, promptTokens = 3, maxTokens = 5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L), "doc 2 must drop")
    assert(out(0).getLong(4) == 3L && !out(0).getBoolean(5))
    val r3 = out(1)
    assert(r3.getString(1) == md5hex("p q r"))
    assert(r3.getString(2) == md5hex("s"))
    assert(r3.getLong(3) == 3L && r3.getLong(4) == 1L && r3.getBoolean(5))
  }

  test("agg_gini: equal values give zero; a hand-computed split gives 1/6") {
    // type a: four equal values → G = 0 exactly; type b: cents
    // {100 x2, 200}: T2 = 100·(2·1+1) + 200·3 = 900, G = 1800/1200 −
    // 4/3 → micro 1500000 − 1333333 = 166667
    val ev = (1 to 4).map(i => (i.toLong, "2024-01-01 01:00:00", "a", 1.00)) ++
      Seq((10L, "2024-01-01 01:00:00", "b", 1.00),
        (11L, "2024-01-01 01:00:00", "b", 1.00),
        (12L, "2024-01-01 01:00:00", "b", 2.00))
    val df = ev.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = Aggs.gini(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", 4L, 0L), ("b", 3L, 166667L)))
  }

  test("ts_cusum: a slow level shift alarms where no single hour would") {
    // 7 hours at 1 then 3 at 13: every +13 hour is only +2.2σ (a 3σ
    // z-test stays silent) but the cumulative drift crosses k=4 σ at
    // the LAST hour: S = 252, 252² = 63504 > 16·(H·Q − S²) = 48384
    val rows = (0 until 7).map(h =>
      (h.toLong, f"2024-01-01 0$h%d:30:00", "a", 1.0)) ++
      (7 until 10).flatMap(h => (0 until 13).map(i =>
        ((h * 100 + i).toLong, f"2024-01-01 0$h%d:30:00", "a", 1.0)))
    val df = rows.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = StreamBatchOps.cusum(df).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val h0 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond
    assert(out.toSeq == Seq((h0 + 9 * 3600, 13L, 252L)))
  }

  test("ts_shape_topk: identical days rank first, a spiked day ranks by its distance") {
    // three days of type a: d1 and d2 identical (h0=1, h1=1 → dist 0),
    // d3 spikes h0=5 → dist to both = (5−1)² + (0−1)² = 17
    val rows = Seq(("2024-01-01", 0, 1), ("2024-01-01", 1, 1),
      ("2024-01-02", 0, 1), ("2024-01-02", 1, 1),
      ("2024-01-03", 0, 5)).flatMap { case (d, h, c) =>
      (0 until c).map(i => ((h * 1000 + i).toLong, f"$d $h%02d:30:00"))
    }.zipWithIndex.map { case ((_, ts), i) => (i.toLong, ts, "a", 1.0) }
    val df = rows.toDF("event_id", "ts_s", "event_type", "value")
      .select(col("event_id"), to_timestamp(col("ts_s")).as("ts"),
        col("event_type"), col("value"))
    val out = StreamBatchOps.shapeTopK(df).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", "2024-01-02", 0L, 1L),
      ("2024-01-01", "2024-01-03", 17L, 2L),
      ("2024-01-02", "2024-01-01", 0L, 1L),
      ("2024-01-02", "2024-01-03", 17L, 2L),
      ("2024-01-03", "2024-01-01", 17L, 1L),
      ("2024-01-03", "2024-01-02", 17L, 2L)))
  }

  test("pipeline_span_corrupt: spans collapse to one sentinel, targets carry the removed tokens") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // period 5, span 3 over 8 words: positions 0,1,2 mask (one <X>),
    // 3,4 keep, 5,6,7 mask (second span starts at 5) →
    // corrupted "<X> d e <X>", targets "a b c f g h", spans = 2
    val docs = Seq((1L, "a b c d e f g h", "en", "s", 1L),
      (2L, "only one", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.spanCorrupt(docs, period = 5, spanLen = 3).collect()
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2)) == (8L, 2L))
    assert(r1.getString(3) == md5hex("<X> d e <X>"))
    assert(r1.getString(4) == md5hex("a b c f g h"))
    // 2 words: single span swallows both → corrupted "<X>", targets all
    val r2 = out(1)
    assert((r2.getLong(1), r2.getLong(2)) == (2L, 1L))
    assert(r2.getString(3) == md5hex("<X>"))
    assert(r2.getString(4) == md5hex("only one"))
  }

  test("pipeline_interleave_sources: positions are a bijection that alternates sources") {
    val docs = (1L to 4L).map(i =>
        (i, s"t$i", "en", if (i <= 2) "s0" else "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.interleaveSources(docs).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L, 3L), "pos must be dense")
    assert(out.map(_._1).toSeq == Seq("s0", "s1", "s0", "s1"),
      "round-robin must alternate sources")
  }

  test("pipeline_interleave_sources: in-source order is the md5 shuffle, not doc_id") {
    // with enough docs the md5 order must differ from doc_id order
    // (the interleave is a deterministic SHUFFLE, not an id sort)
    val docs = (1L to 64L).map(i => (i, s"t$i", "en", "s0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ids = CorpusOps.interleaveSources(docs).collect().map(_.getLong(0))
    assert(ids.sorted.toSeq == (1L to 64L).toSeq)
    assert(ids.toSeq != (1L to 64L).toSeq, "order must be hash-shuffled")
  }
}
