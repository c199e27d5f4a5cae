package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.{SparkSpec, Tables}
import graft.operators.StreamBatchOps

/** Streaming window semantics (SURVEY §2-B "Streaming", §7 M6): tumbling +
  * watermark + late-data drop, sliding, session windows, streaming dedup,
  * and arbitrary state — driven through MemoryStream.
  */
class StreamingWindowSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window + watermark finalizes windows and drops late data") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val counts = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("cnt"))

    val q = counts.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts("2024-01-01 00:05:00")), (2L, ts("2024-01-01 00:55:00")))
      q.processAllAvailable()
      // nothing finalized yet (watermark still inside the window)
      assert(spark.table("tumbling").count() === 0)

      // jump 2h → watermark passes 01:00 + 10min → window [00:00,01:00) final
      in.addData((3L, ts("2024-01-01 03:00:00")))
      q.processAllAvailable()
      val rows = spark.table("tumbling").collect().map(r => (r.getTimestamp(0), r.getLong(1)))
      assert(rows.toSeq === Seq((ts("2024-01-01 00:00:00"), 2L)))

      // a very late event for the finalized window is DROPPED
      in.addData((4L, ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      assert(spark.table("tumbling").count() === 1)
      StreamWindowsArtifact.record("tumbling_watermark", input = 4, output = 1,
        claim = "1h tumbling window finalized by watermark; late event for a " +
          "closed window dropped", q = Some(q))
    } finally q.stop()
  }

  test("ohlc bars aggregation streams: min_by/max_by state finalizes under the watermark") {
    // the EXACT expressions StreamBatchOps.ohlcBars aggregates with
    // (integer cents, min_by/max_by on event_id) running as a
    // streaming query — proves the round-11 bar compressor is
    // watermark-compatible, not batch-only
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val bars = in.toDF().toDF("event_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .select(col("event_id"), col("ts"), cents.as("cents"))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_ticks"),
        min_by(col("cents"), col("event_id")).as("open_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"),
        max_by(col("cents"), col("event_id")).as("close_cents"))
      .select(col("window.start").as("w"), col("n_ticks"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"))
    val q = bars.writeStream.format("memory").queryName("ohlcbars")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, ts("2024-01-01 05:10:00"), 10.50),
        (2L, ts("2024-01-01 05:20:00"), 9.25),
        (3L, ts("2024-01-01 05:30:00"), 11.00))
      q.processAllAvailable()
      assert(spark.table("ohlcbars").count() === 0, "bar still open")
      in.addData((4L, ts("2024-01-01 08:00:00"), 7.77))
      q.processAllAvailable()
      val rows = spark.table("ohlcbars").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(rows.toSeq === Seq(
        (ts("2024-01-01 05:00:00"), 3L, 1050L, 1100L, 925L, 1100L)))
      StreamWindowsArtifact.record("ohlc_streaming", input = 4, output = 1,
        claim = "ts_ohlc_bars expressions (integer cents, min_by/max_by " +
          "open/close) run as a watermarked streaming aggregation; the " +
          "bar finalizes when the watermark passes the hour", q = Some(q))
    } finally q.stop()
  }

  test("sliding windows assign each event to overlapping windows (batch form)") {
    val ev = Tables.events(spark, sf()).limit(100)
    val slid = ev.select(col("event_id"), window(col("ts"), "1 hour", "15 minutes"))
    // hour window sliding by 15min → every event falls in exactly 4 windows
    assert(slid.count() === 400)
    StreamWindowsArtifact.record("sliding_batch", input = 100, output = 400,
      claim = "1h window sliding 15min assigns each event to exactly 4 windows")
  }

  test("session_window streaming matches the gaps-and-islands batch equivalent") {
    val sess = spark
    import sess.implicits._
    val ev = Tables.events(spark, sf())

    // batch session_window (same expression a streaming query uses)
    val viaSessionWindow = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    // gaps-and-islands at µs precision with session_window's boundary rule
    // (merge while next_start < prev_start + gap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tsm", "event_id")
    val wc = w.rowsBetween(Long.MinValue, 0)
    // readable failure on the next silent fixture-type drift (r7 #2: a
    // regenerated events.parquet turned ts into TIMESTAMP_NTZ and
    // unix_micros threw DATATYPE_MISMATCH — the loader now normalizes)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType,
      s"Tables.events must normalize ts to TimestampType, got " +
        s"${ev.schema("ts").dataType} — see Tables.events scaladoc")
    val islands = ev
      .select(col("user_id"), col("event_id"),
        graft.functions.TimeFns.epochMicros(ev, "ts").as("tsm"))
      .withColumn("new_sess",
        when(col("tsm") - lag(col("tsm"), 1).over(w) < 1800L * 1000000L, 0).otherwise(1))
      .withColumn("sess_id", sum(col("new_sess")).over(wc))
      .groupBy("user_id", "sess_id").agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    assert(viaSessionWindow.sameElements(islands))
    // and the oracle-checked floor-to-second variant has the same shape
    assert(StreamBatchOps.sessions(ev).count() > 0)
    StreamWindowsArtifact.record("session_window_equivalence",
      input = ev.count(), output = viaSessionWindow.length,
      claim = "session_window(30min) sessions == gaps-and-islands batch " +
        "equivalent at us precision")
  }

  test("stream_dedup_batch expressions run streaming: min-struct keeper finalizes under the watermark") {
    // the EXACT aggregation stream_dedup_batch (StreamBatchOps
    // .dedupBatch) uses — window + min(struct(ts, event_id, cents)) +
    // count — as a watermarked streaming query: proves the batch twin's
    // keeper semantics are watermark-compatible, and that a duplicate
    // arriving WITHIN the open window loses to the earlier (ts,
    // event_id) keeper regardless of arrival order
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
    val dedup = in.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"), cents.as("cents"))
      .groupBy(window(col("ts"), "1 hour"), col("user_id"),
        col("event_type"))
      .agg(min(struct(col("ts"), col("event_id"), col("cents")))
          .as("first"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("w"), col("user_id"),
        col("first.event_id").as("kept_event_id"),
        (col("n_events") - 1).as("n_suppressed"))
    val q = dedup.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append).start()
    try {
      // LATER event_id arrives first; the earlier-ts duplicate second —
      // arrival order must not matter to the keeper
      in.addData((2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.00))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.00))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() === 0) // window still open
      // advance the watermark past 01:00 + 10min -> window finalizes
      in.addData((3L, ts("2024-01-01 02:00:00"), 1L, "click", 3.00))
      q.processAllAvailable()
      val rows = spark.table("sdedup").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(rows === Seq(
        (ts("2024-01-01 00:00:00"), 1L, 1L, 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups replayed message ids") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp)]
    val deduped = in.toDF().toDF("messageId", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("messageId")

    val q = deduped.writeStream.format("memory").queryName("dedupstream")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(("m1", ts("2024-01-01 00:00:00")), ("m2", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // redelivery of m1 (at-least-once source) within the watermark
      in.addData(("m1", ts("2024-01-01 00:02:00")))
      q.processAllAvailable()
      assert(spark.table("dedupstream").select("messageId").collect()
        .map(_.getString(0)).sorted.toSeq === Seq("m1", "m2"))
      StreamWindowsArtifact.record("dedup_within_watermark", input = 3, output = 2,
        claim = "redelivered messageId within the watermark horizon deduped",
        q = Some(q))
    } finally q.stop()
  }

  test("windowed aggregation runs inside the bus pipeline's transform slot") {
    import graft.sources.InMemoryBus
    val id = java.util.UUID.randomUUID().toString.take(8)
    val (inTopic, inSub, outTopic, outSub) =
      (s"w-in-$id", s"w-insub-$id", s"w-out-$id", s"w-outsub-$id")
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)

    // replay event-shaped JSON through the bus; the transform is the SAME
    // windowed-agg expression the batch oracle checks (M6): watermark +
    // tumbling 1h counts, append mode emits finalized windows as messages
    def msg(t: String) = s"""{"ts":"$t","user":1}""".getBytes("UTF-8")
    Seq("2024-01-01 00:05:00", "2024-01-01 00:45:00", "2024-01-01 03:00:00")
      .foreach(t => InMemoryBus.publish(inTopic, msg(t)))

    val schema = new org.apache.spark.sql.types.StructType()
      .add("ts", "string").add("user", "long")
    val pipe = new Pipeline(spark, inSub, outTopic, JsonSerde(schema),
      df => df
        .select(col("payload.ts").cast("timestamp").as("ts"), col("payload.user"))
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("cnt")),
      java.nio.file.Files.createTempDirectory("wdemo-ckpt").toString,
      bulkLimit = 2 /* forces multiple micro-batches -> watermark advances */)
    val q = pipe.start(availableNow = true)
    q.awaitTermination(60000)

    val out = InMemoryBus.payloads(outSub).map(new String(_, "UTF-8"))
    // window [00:00,01:00) finalized once the 03:00 event advanced the
    // watermark; the 03:00 window itself is still open -> not emitted
    assert(out === Seq("""{"w":"00:00","cnt":2}"""))
    StreamWindowsArtifact.record("bus_pipeline_windowed_agg", input = 3,
      output = out.length,
      claim = "watermarked tumbling agg inside the bus pipeline transform " +
        "slot; only the finalized window is published", q = Some(q))
  }

  test("transformWithState (operator state API v2): value state + RocksDB store") {
    import org.apache.spark.sql.streaming.{OutputMode => OM, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.{Encoders => E}
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext

    class RunningTotal extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {
      @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _
      override def init(outputMode: OM, timeMode: TimeMode): Unit =
        total = getHandle.getValueState[Long]("total", E.scalaLong, TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                   timerValues: TimerValues): Iterator[(Long, Long)] = {
        val next = (if (total.exists()) total.get() else 0L) + rows.map(_._2).sum
        total.update(next)
        Iterator.single((key, next))
      }
    }

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Long)]
      val counted = in.toDS().groupByKey(_._1)
        .transformWithState(new RunningTotal, TimeMode.None(), OutputMode.Update)
      val q = counted.toDF("user_id", "total").writeStream.format("memory")
        .queryName("twscounts").outputMode(OutputMode.Update).start()
      try {
        in.addData((1L, 4L), (2L, 7L)); q.processAllAvailable()
        in.addData((1L, 6L)); q.processAllAvailable()
        val last = spark.table("twscounts").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).map { case (u, vs) => (u, vs.map(_._2).max) }
        assert(last === Map(1L -> 10L, 2L -> 7L))
        StreamWindowsArtifact.record("transform_with_state_rocksdb", input = 3,
          output = spark.table("twscounts").count(),
          claim = "transformWithState value state on RocksDB store " +
            "accumulates across micro-batches", q = Some(q))
      } finally q.stop()
    } finally prevProvider match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("arbitrary state: per-user running counts survive across micro-batches") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, increment)

    val counted = in.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(next)
          (user, next)
      }

    val q = counted.toDF("user_id", "total").writeStream.format("memory")
      .queryName("statecounts").outputMode(OutputMode.Update).start()
    try {
      in.addData((1L, 2L), (2L, 5L))
      q.processAllAvailable()
      in.addData((1L, 3L))
      q.processAllAvailable()
      val last = spark.table("statecounts").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (u, vs) => (u, vs.map(_._2).max) }
      assert(last === Map(1L -> 5L, 2L -> 5L))
      StreamWindowsArtifact.record("map_groups_with_state", input = 3,
        output = spark.table("statecounts").count(),
        claim = "mapGroupsWithState per-key totals survive micro-batches",
        q = Some(q))
    } finally q.stop()
  }

  test("stream-stream inner join: time-bounded attribution, late rows dropped") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impIn = MemoryStream[(Long, Timestamp)]
    val clickIn = MemoryStream[(Long, Timestamp)]
    // the canonical attribution join: click matches an impression of the
    // same ad within [imp_ts, imp_ts + 10min]; BOTH watermarks bound the
    // buffered state, so at scale neither side's join buffer grows past
    // the watermark horizon
    val imps = impIn.toDF().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val clicks = clickIn.toDF().toDF("c_ad_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val joined = imps.join(clicks,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()
    try {
      impIn.addData((1L, ts("2024-01-01 00:00:00")))
      clickIn.addData((1L, ts("2024-01-01 00:05:00"))) // in-window click
      clickIn.addData((2L, ts("2024-01-01 00:06:00"))) // no impression
      q.processAllAvailable()
      assert(spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getTimestamp(3))).toSeq ===
        Seq((1L, ts("2024-01-01 00:05:00"))))

      // a click OUTSIDE the 10-minute window never matches
      clickIn.addData((1L, ts("2024-01-01 00:30:00")))
      q.processAllAvailable()
      assert(spark.table("attrib").count() === 1)

      // advance both watermarks past 00:10, then replay an in-window
      // click: the row is older than the watermark and is dropped, not
      // joined (bounded state, the scale-critical property)
      impIn.addData((91L, ts("2024-01-01 01:00:00")))
      clickIn.addData((92L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      clickIn.addData((1L, ts("2024-01-01 00:07:00")))
      q.processAllAvailable()
      assert(spark.table("attrib").count() === 1)
      StreamWindowsArtifact.record("stream_stream_inner", input = 7, output = 1,
        claim = "time-bounded attribution join; out-of-window and " +
          "older-than-watermark clicks never match", q = Some(q))
    } finally q.stop()
  }

  test("stream-stream left-outer join emits unmatched rows after watermark expiry") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impIn = MemoryStream[(Long, Timestamp)]
    val clickIn = MemoryStream[(Long, Timestamp)]
    val imps = impIn.toDF().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "10 minutes")
    val clicks = clickIn.toDF().toDF("c_ad_id", "click_ts")
      .withWatermark("click_ts", "10 minutes")
    val joined = imps.join(clicks,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")

    val q = joined.writeStream.format("memory").queryName("attribouter")
      .outputMode(OutputMode.Append).start()
    try {
      impIn.addData((5L, ts("2024-01-01 00:00:00"))) // never clicked
      q.processAllAvailable()
      // not emitted yet: a matching click could still arrive
      assert(spark.table("attribouter").count() === 0)

      // push both watermarks well past the join window's upper bound,
      // then nudge another batch so the expired state flushes
      impIn.addData((101L, ts("2024-01-01 02:00:00")))
      clickIn.addData((102L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      impIn.addData((103L, ts("2024-01-01 02:30:00")))
      clickIn.addData((104L, ts("2024-01-01 02:30:00")))
      q.processAllAvailable()
      val outer = spark.table("attribouter").collect()
        .filter(r => r.getLong(0) == 5L)
        .map(r => (r.getLong(0), r.isNullAt(2), r.isNullAt(3)))
      assert(outer.toSeq === Seq((5L, true, true)),
        "unmatched impression should emit with null click side after expiry")
      StreamWindowsArtifact.record("stream_stream_left_outer", input = 5,
        output = spark.table("attribouter").count(),
        claim = "left-outer stream-stream join emits null-padded row only " +
          "after watermark expiry", q = Some(q))
    } finally q.stop()
  }

  test("two watermarked bus streams join end to end; expiry survives checkpoint resume") {
    import graft.sources.{BusProvider, InMemoryBus}
    val id = java.util.UUID.randomUUID().toString.take(8)
    val impTopic = s"ss-imp-$id"; val impSub = s"ss-impsub-$id"
    val clkTopic = s"ss-clk-$id"; val clkSub = s"ss-clksub-$id"
    val outTopic = s"ss-out-$id"; val outSub = s"ss-outsub-$id"
    Seq(impTopic -> impSub, clkTopic -> clkSub, outTopic -> outSub).foreach {
      case (t, s) => InMemoryBus.createTopic(t); InMemoryBus.createSubscription(t, s)
    }
    val schema = new org.apache.spark.sql.types.StructType()
      .add("ad", "long").add("ts", "string")
    def msg(ad: Long, t: String) = s"""{"ad":$ad,"ts":"$t"}""".getBytes("UTF-8")
    def busStream(sub: String) = spark.readStream.format(BusProvider.format)
      .option("subscription", sub).load()
      .select(from_json(col("value").cast("string"), schema).as("p"))
    val ckpt = java.nio.file.Files.createTempDirectory("ssjoin-ckpt").toString

    def runDrain(): Unit = {
      val imps = busStream(impSub)
        .select(col("p.ad").as("ad_id"), col("p.ts").cast("timestamp").as("imp_ts"))
        .withWatermark("imp_ts", "10 minutes")
      val clicks = busStream(clkSub)
        .select(col("p.ad").as("c_ad_id"), col("p.ts").cast("timestamp").as("click_ts"))
        .withWatermark("click_ts", "10 minutes")
      val q = imps.join(clicks,
          col("ad_id") === col("c_ad_id") &&
            col("click_ts") >= col("imp_ts") &&
            col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 MINUTES"))
        .select(to_json(struct(col("ad_id"),
          date_format(col("click_ts"), "HH:mm").as("click"))).as("j"))
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val topic = outTopic
          batch.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
            rows.foreach(r => InMemoryBus.publish(topic, r.getString(0).getBytes("UTF-8")))
          }
        }
        .start()
      q.awaitTermination(60000)
    }

    // run 1: one in-window match, one no-impression click, then traffic
    // that pushes BOTH watermarks past 00:10 (state for ad 1 expires)
    InMemoryBus.publish(impTopic, msg(1L, "2024-01-01 00:00:00"))
    InMemoryBus.publish(clkTopic, msg(1L, "2024-01-01 00:05:00"))
    InMemoryBus.publish(clkTopic, msg(2L, "2024-01-01 00:06:00"))
    InMemoryBus.publish(impTopic, msg(91L, "2024-01-01 01:00:00"))
    InMemoryBus.publish(clkTopic, msg(92L, "2024-01-01 01:00:00"))
    runDrain()
    assert(InMemoryBus.payloads(outSub).map(new String(_, "UTF-8"))
      === Seq("""{"ad_id":1,"click":"00:05"}"""))

    // run 2 (same checkpoint): the restored watermark is past 00:10, so a
    // replayed in-window click for ad 1 is older than the watermark —
    // dropped on input, NOT joined (its partner's state already expired);
    // a fresh in-window pair proves the join is live after the resume
    InMemoryBus.publish(clkTopic, msg(1L, "2024-01-01 00:07:00"))
    InMemoryBus.publish(impTopic, msg(7L, "2024-01-01 01:02:00"))
    InMemoryBus.publish(clkTopic, msg(7L, "2024-01-01 01:06:00"))
    runDrain()
    val out2 = InMemoryBus.payloads(outSub).map(new String(_, "UTF-8"))
    assert(out2.sorted === Seq(
      """{"ad_id":1,"click":"00:05"}""",
      """{"ad_id":7,"click":"01:06"}""").sorted,
      s"late click must expire, fresh pair must join: $out2")
    StreamWindowsArtifact.record("bus_join_checkpoint_resume", input = 8,
      output = out2.length,
      claim = "stream-stream join over two bus streams; watermark state " +
        "restored across checkpoint resume expires the replayed late click")
  }

  test("a §2-C corpus operator runs INSIDE the bus runner; dedup state survives checkpoint stop/resume (r11 verdict #4)") {
    // The reference's whole premise is processor-inside-pipeline
    // (pubsub_pipeline.py:62,181): the processor slot holds the user's
    // logic and the runner owns pull/ack/publish. Until now every §2-C
    // operator was proven in batch and the runner was proven with
    // identity/serde transforms — this closes the composition: the
    // corpus-prep QUALITY GATE (the exact library stage object from
    // CorpusOps.corpusPrepPipeline, not a re-implementation) plus the
    // exact-dedup stage in its streaming form (dropDuplicates state)
    // run in the transform slot, and the dedup state provably SURVIVES
    // a checkpoint stop/resume: a wave-2 duplicate of a wave-1 document
    // is suppressed by restored state, not by anything in wave 2.
    import graft.sources.InMemoryBus
    val id = java.util.UUID.randomUUID().toString.take(8)
    val inTopic = s"corpus-in-$id"; val inSub = s"corpus-insub-$id"
    val outTopic = s"corpus-out-$id"; val outSub = s"corpus-outsub-$id"
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", "long").add("text", "string")
    val ckpt = java.nio.file.Files.createTempDirectory("corpus-gate-ckpt").toString
    // the LIBRARY quality gate (minWords = 4), pulled from the batch
    // pipeline's stage list — streaming-compatible because it is a pure
    // stateless projection+filter
    val qualityGate = graft.operators.CorpusOps
      .corpusPrepPipeline(spark.range(0).toDF(), minWords = 4)
      .stages.collectFirst { case ("quality_gate", f) => f }.get
    def mkPipeline() = new Pipeline(spark, inSub, outTopic,
      JsonSerde(schema),
      transform = df => {
        val docs = df.select(col("payload.doc_id").as("doc_id"),
          col("payload.text").as("text"))
        // exact_dedup's streaming form: the batch stage's row_number
        // window is not streamable; dropDuplicates IS its streaming
        // equivalent (keep-first per text, state-store backed)
        qualityGate(docs).dropDuplicates("text")
          .select("doc_id", "text", "n_words")
      },
      checkpointDir = ckpt)
    def good(i: Long) = s"""{"doc_id":$i,"text":"unique document body number $i"}"""
    def dupOf(i: Long, as: Long) = s"""{"doc_id":$as,"text":"unique document body number $i"}"""
    def short(i: Long) = s"""{"doc_id":$i,"text":"too short"}"""
    def outDocs(): Seq[(Long, String)] = InMemoryBus.payloads(outSub)
      .map(b => new String(b, "UTF-8"))
      .map { j =>
        val r = spark.range(1).select(
          from_json(lit(j), schema.add("n_words", "int")).as("p"))
          .select(col("p.doc_id"), col("p.text")).head()
        (r.getLong(0), r.getString(1))
      }

    // wave 1: two good docs, an in-batch duplicate, a low-quality doc
    Seq(good(1), good(2), dupOf(1, as = 3), short(4))
      .foreach(m => InMemoryBus.publish(inTopic, m.getBytes("UTF-8")))
    val q1 = mkPipeline().start(availableNow = true)
    q1.awaitTermination(60000)
    val run1 = outDocs()
    assert(run1.map(_._2).sorted ===
      Seq("unique document body number 1", "unique document body number 2"),
      s"wave 1 must emit each unique quality-passing text once: $run1")

    // wave 2, NEW pipeline instance on the SAME checkpoint: a cross-run
    // duplicate of doc 1's text (the resume probe), one fresh doc, one
    // more low-quality doc
    Seq(dupOf(1, as = 5), good(6), short(7))
      .foreach(m => InMemoryBus.publish(inTopic, m.getBytes("UTF-8")))
    val q2 = mkPipeline().start(availableNow = true)
    q2.awaitTermination(60000)
    val run2 = outDocs().drop(run1.size)
    assert(run2.map(_._1) === Seq(6L),
      s"restored dedup state must suppress the wave-2 duplicate and " +
        s"pass only the fresh doc: $run2")
    val stateRows = q2.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsTotal)
    assert(stateRows.nonEmpty && stateRows.max === 3L,
      s"dedup state must hold the 3 unique texts (2 restored + 1 new): $stateRows")
    StreamWindowsArtifact.record("bus_corpus_gate_resume", input = 7,
      output = run1.size + run2.size,
      claim = "CorpusOps quality gate (library stage) + streaming exact " +
        "dedup run inside the bus runner's transform slot; state restored " +
        "on checkpoint resume suppresses a cross-run duplicate",
      q = Some(q2))
  }

  override def afterAll(): Unit = {
    // refresh docs/STREAMWINDOWS.json only when the whole family ran
    StreamWindowsArtifact.flushIfComplete()
    super.afterAll()
  }
}
