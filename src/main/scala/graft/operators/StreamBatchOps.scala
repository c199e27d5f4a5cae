package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-equivalent forms of the streaming windowed aggregations
  * (SURVEY §2-B "Streaming"). The same expressions run unchanged in a
  * `readStream` plan with `withWatermark` (see `graft.streaming`); here
  * they execute over the `events` table so the DuckDB oracle can check
  * the window semantics.
  */
object StreamBatchOps {

  /** Shared body of the time-windowed aggregations: `window()` is the
    * identical expression a streaming query uses; in batch it's a plain
    * groupBy (one partial+final agg). Output key is epoch seconds of the
    * window start to dodge cross-engine timestamp encoding. (Spark's
    * window() drops NULL-timestamp rows; the oracle SQL filters them
    * explicitly for the same semantics.) */
  private def windowed(events: DataFrame, duration: String,
                       slide: Option[String], keyName: String): DataFrame = {
    val w = slide.fold(window(col("ts"), duration))(s => window(col("ts"), duration, s))
    events
      .groupBy(w)
      .agg(count(lit(1)).as("cnt"), Num.dsum(col("value")).as("total_value"))
      .select(
        unix_timestamp(col("window.start")).as(keyName),
        col("cnt"), col("total_value"))
      .orderBy(keyName)
  }

  /** `stream_tumbling_batch`: tumbling 1-hour event-time windows. */
  def tumbling(events: DataFrame): DataFrame =
    windowed(events, "1 hour", None, "hour_start_s")

  /** `stream_sliding_batch`: 1-hour windows sliding every 15 minutes —
    * each event lands in exactly 4 overlapping windows (the oracle
    * reproduces the slots with time_bucket + 4 offsets). */
  def sliding(events: DataFrame): DataFrame =
    windowed(events, "1 hour", Some("15 minutes"), "slot_s")

  /** `stream_session_batch`: session windows with a 30-minute gap, per
    * user — the gaps-and-islands batch equivalent of
    * `session_window(ts, "30 minutes")`. Two windows over ONE shuffle on
    * user_id (same partitioning reused), then a hash agg. */
  def sessions(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col("ts"), 1).over(w)
    val newSess = when(
      prevTs.isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(prevTs)) > gapSec,
      1).otherwise(0)
    events
      .select(col("user_id"), col("ts"), col("event_id"), newSess.as("new_sess"))
      .select(col("user_id"), col("ts"), col("event_id"),
        sum(col("new_sess")).over(wc).as("sess_id"))
      .groupBy("user_id", "sess_id")
      .agg(
        min(unix_timestamp(col("ts"))).as("session_start_s"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "sess_id")
  }
}
