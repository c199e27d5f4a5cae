package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.functions.TimeFns
import graft.operators.StreamBatchOps

/** Timestamp-flavor robustness at the `Tables.events` loader seam (r7
  * verdict #2/#4): driver fixture regenerations have shipped `events.ts`
  * as TIMESTAMP(NANOS), TIMESTAMP_NTZ, and TIMESTAMP — the loader must
  * normalize ALL of them to the same UTC `TimestampType` micros, so the
  * operator library and the oracle see one type. Exercises the NTZ and
  * LTZ parquet flavors round-trip (the NANOS flavor needs a writer Spark
  * doesn't have; its read path is the long-standing `nanosAsLong`
  * branch, covered by the driver fixture history itself).
  */
class TablesNtzSpec extends SparkSpec {

  private def writeVariant(flavor: String): String = {
    val base = Tables.events(spark, sf())
    val dir = java.nio.file.Files.createTempDirectory(s"events_$flavor").toString
    val ts = if (flavor == "ntz") col("ts").cast(TimestampNTZType) else col("ts")
    base.withColumn("ts", ts).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("loader normalizes an NTZ events fixture to UTC TimestampType, micros intact") {
    val base = Tables.events(spark, sf())
    assert(base.schema("ts").dataType == TimestampType)
    val ntz = Tables.events(spark, writeVariant("ntz"))
    assert(ntz.schema("ts").dataType == TimestampType,
      s"NTZ fixture not normalized: ${ntz.schema("ts").dataType}")
    val want = base.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val got = ntz.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want), "NTZ normalization changed epoch micros")
  }

  test("loader passes an LTZ events fixture through unchanged") {
    val base = Tables.events(spark, sf())
    val ltz = Tables.events(spark, writeVariant("ltz"))
    assert(ltz.schema("ts").dataType == TimestampType)
    assert(ltz.agg(sum(unix_micros(col("ts")))).head.getLong(0) ==
      base.agg(sum(unix_micros(col("ts")))).head.getLong(0))
  }

  test("a representative ts query is flavor-invariant end to end") {
    val onNtz = StreamBatchOps.sessions(Tables.events(spark, writeVariant("ntz")))
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val onLtz = StreamBatchOps.sessions(Tables.events(spark, writeVariant("ltz")))
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(onNtz.sameElements(onLtz))
  }

  test("TimeFns.epochMicros agrees across flavors without the loader") {
    // frames that DON'T come through Tables (user data) hit NTZ raw —
    // the helper must give the same epoch as unix_micros on LTZ
    val base = Tables.events(spark, sf()).select("event_id", "ts")
    val asNtz = base.withColumn("ts", col("ts").cast(TimestampNTZType))
    val viaLtz = base.select(col("event_id"),
      TimeFns.epochMicros(base, "ts").as("m"))
    val viaNtz = asNtz.select(col("event_id"),
      TimeFns.epochMicros(asNtz, "ts").as("m"))
    val a = viaLtz.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = viaNtz.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
    intercept[IllegalArgumentException] {
      TimeFns.epochMicros(base.select(col("event_id")), "event_id")
    }
  }
}
