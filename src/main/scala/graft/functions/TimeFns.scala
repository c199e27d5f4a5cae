package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Timestamp helpers under the engine's ONE documented timezone
  * convention (see `Tables.events` scaladoc): **TIMESTAMP_NTZ wall-clock
  * is UTC.** `Tables` normalizes every fixture to `TimestampType` at the
  * loader seam, so operators inside the library never meet NTZ — these
  * helpers exist for frames that arrive from OUTSIDE the loaders (user
  * data, test doubles), where LTZ-only functions (`unix_micros`,
  * `unix_millis`, `unix_seconds`) throw DATATYPE_MISMATCH on an NTZ
  * column (the round-7 StreamingWindowSpec failure).
  */
object TimeFns {
  private val NtzEpoch: Column =
    lit("1970-01-01 00:00:00").cast(TimestampNTZType)

  /** Epoch microseconds for either timestamp flavor. NTZ is diffed
    * against the NTZ epoch — session-timezone-independent by
    * construction (a cast through LTZ would re-interpret the wall-clock
    * in whatever tz the session happens to run). */
  def epochMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case TimestampNTZType => timestamp_diff("MICROSECOND", NtzEpoch, c)
    case other => throw new IllegalArgumentException(
      s"epochMicros: not a timestamp column (found $other)")
  }

  /** Schema-driven overload: resolves the column's flavor from `df`. */
  def epochMicros(df: DataFrame, name: String): Column =
    epochMicros(df(name), df.schema(name).dataType)
}
