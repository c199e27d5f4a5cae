package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-fixture edge semantics for the late round-3 operators — the
  * boundaries the oracle gate's generated data may not hit: as-of tie
  * inclusivity, leading/multi-gap LOCF, EOS packing bytes, vocabulary
  * tie-breaks. (Bulk correctness is the DuckDB gate's job; these pin the
  * corners.)
  */
class EdgeSemanticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("forward as-of: equal timestamp is an inclusive match; later orders see nothing") {
    val sess = spark
    import sess.implicits._
    val orders = Seq(
      (100L, 1L, ts("2024-01-01 12:00:00")), // equal-ts event must match
      (101L, 1L, ts("2024-06-01 00:00:00"))) // after every event: no match
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val events = Seq(
      (9000L, 1L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = Joins.asofOrderForward(orders, events).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(got.toSeq === Seq(
      (100L, ts("2024-01-01 12:00:00").getTime / 1000),
      (101L, -1L)))
  }

  test("gapfill: LOCF carries across multi-hour gaps, per type independently") {
    val sess = spark
    import sess.implicits._
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:10:00"), "a", 1.0),
      (2L, 1L, ts("2024-01-01 00:20:00"), "a", 1.0), // hour 0: n=2
      (3L, 1L, ts("2024-01-01 03:10:00"), "a", 1.0), // hours 1,2 are gaps
      (4L, 1L, ts("2024-01-01 05:30:00"), "b", 1.0)) // type b: single hour
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = StreamBatchOps.gapfill(events).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
    val h0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(got.toSeq === Seq(
      ("a", h0, 2L, 2L),
      ("a", h0 + 3600, -1L, 2L),  // gap: n NULL, LOCF carries 2
      ("a", h0 + 7200, -1L, 2L),
      ("a", h0 + 10800, 1L, 1L),
      ("b", h0 + 18000, 1L, 1L))) // type b spine starts at ITS min hour
  }

  test("rolling 24h: counts drop out of the window exactly 24 slots later") {
    val sess = spark
    import sess.implicits._
    val events = Seq(
      (1L, 1L, ts("2024-01-01 00:30:00"), "a", 1.0),
      (2L, 1L, ts("2024-01-02 00:30:00"), "a", 1.0), // exactly 24h later
      (3L, 1L, ts("2024-01-02 01:30:00"), "a", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = StreamBatchOps.rolling(events).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    val h0 = ts("2024-01-01 00:00:00").getTime / 1000
    assert(got.toSeq === Seq(
      (h0, 1L, 1L),
      // hour 0 of day 2 is slot 24 → day-1 hour 0 has LEFT the frame
      (h0 + 86400, 1L, 1L),
      (h0 + 90000, 2L, 2L))) // day-2 hours 0 and 1 both inside
  }

  test("concurrency sweep: end-exclusive ties and slice-boundary carry are exact") {
    val sess = spark
    import sess.implicits._
    // type a: e1's window ends 12:10:00 exactly when e4 starts (the −1
    // must apply first: peak stays 3, a tie bug would read 4); e5's
    // window straddles the 13:00 hour-slice boundary, so slice 13's
    // peak is only correct with the +1 carry from slice 12
    val events = Seq(
      (1L, 1L, ts("2024-01-01 12:00:00"), "a", 1.0),
      (2L, 1L, ts("2024-01-01 12:05:00"), "a", 1.0),
      (3L, 1L, ts("2024-01-01 12:09:59"), "a", 1.0),
      (4L, 1L, ts("2024-01-01 12:10:00"), "a", 1.0),
      (5L, 1L, ts("2024-01-01 12:59:30"), "a", 1.0),
      (6L, 1L, ts("2024-01-01 13:04:00"), "a", 1.0),
      (7L, 1L, ts("2024-01-01 08:00:00"), "b", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = StreamBatchOps.intervalConcurrency(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", 6L, 3L), ("b", 1L, 1L)))
    // the slice-and-stitch rewrite must equal the single global sweep:
    // a bucket wider than the whole timeline degenerates to one slice
    val oneSlice = StreamBatchOps
      .intervalConcurrency(events, bucketSecs = 10000000000L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(oneSlice.toSeq === got.toSeq)
  }

  test("intervalOverlap pair-budget guard trips on a planted dense window, normal path unchanged") {
    val sess = spark
    import sess.implicits._
    // 60 events in ONE 10-min window: candidate estimate ≈ 60·60 = 3600
    val dense = (1L to 60L).map(i =>
      (i, 1L, ts("2024-01-01 12:00:01"), "a", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    try {
      spark.conf.set("spark.graft.intervalOverlap.maxEstPairs", "100")
      val err = intercept[IllegalStateException] {
        Joins.intervalOverlap(dense).collect()
      }
      // the failure must steer to the scale-safe sweep count
      assert(err.getMessage.contains("ts_concurrency"), err.getMessage)
      // under the default budget the same data passes and counts exactly:
      // all 60 events pairwise overlap -> C(60,2) = 1770 pairs
      spark.conf.unset("spark.graft.intervalOverlap.maxEstPairs")
      val got = Joins.intervalOverlap(dense).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq === Seq(("a", "a", 1770L)))
      // guard off (0): identical result
      spark.conf.set("spark.graft.intervalOverlap.maxEstPairs", "0")
      val off = Joins.intervalOverlap(dense).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(off.toSeq === got.toSeq)
    } finally spark.conf.unset("spark.graft.intervalOverlap.maxEstPairs")
  }

  test("packText joins chunk members with the EOS separator in doc_id order") {
    val sess = spark
    import sess.implicits._
    // budget 4: docs 1 (3 tokens) + 2 (2 tokens) straddle → doc 2 starts
    // chunk 0's token 3 → chunk 0; doc 3 starts at cum 5 → chunk 1
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"))
      .toDF("doc_id", "text")
    val got = CorpusOps.packText(docs, budget = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq === Seq(
      (0L, 2L, 5L, "a b c<|eos|>d e".length, md5hex("a b c<|eos|>d e")),
      (1L, 1L, 4L, "f g h i".length, md5hex("f g h i"))))
  }

  test("vocab breaks count ties by word and accumulates coverage exactly") {
    val sess = spark
    import sess.implicits._
    val docs = Seq((1L, "b a b a c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val got = CorpusOps.vocab(docs, n = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    // a and b tie at 2 → 'a' first (word asc); cum over the limited rows
    assert(got.toSeq === Seq(
      ("a", 2L, 1, 2L, 5L),
      ("b", 2L, 2, 4L, 5L),
      ("c", 1L, 3, 5L, 5L)))
  }
}
