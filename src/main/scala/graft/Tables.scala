package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators in `graft.operators` are pure `DataFrame => DataFrame`
  * functions; this is the only place that touches storage paths. At cluster
  * scale the same operators run over partitioned/bucketed parquet — loading
  * stays declarative (`spark.read.parquet`) so Catalyst keeps predicate
  * pushdown + column pruning into the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects by
    * default ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos (legacy
    * `nanosAsLong`) and truncate to a microsecond TimestampType — the same
    * µs truncation DuckDB applies when reading ns parquet, so both engines
    * see identical values. Integer `DIV` avoids the double-precision loss
    * a fractional divide would incur on ~1.7e18 nano values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    // driver testdata: ts is TIMESTAMP(NANOS), surfacing as LongType under
    // nanosAsLong → truncate to µs. DataGen scale data: ts is already a
    // µs TimestampType → pass through.
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
