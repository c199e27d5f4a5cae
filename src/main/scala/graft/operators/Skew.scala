package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §0 north star: "salting for skew").
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins; this
  * explicit salt-and-replicate variant is for the cases AQE can't split —
  * e.g. a skewed aggregation key, or a shuffled hash join against a
  * medium dimension that's too big to broadcast but cheap to replicate
  * `salt`×.
  */
object Skew {

  /** Equi-join `skewed ⋈ dim` on `key`, spreading each hot key over
    * `salt` shuffle partitions: the skewed side gets a deterministic salt
    * from a row hash; the dim side is replicated `salt`× with every salt
    * value, so every (key, salt) bucket joins locally. Result set is
    * identical to the unsalted join (verified by SkewSpec).
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 salt: Int = 8): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Scalable global row_number: an unpartitioned `Window.orderBy` pulls
    * every row through ONE task (fine for a dim table, fatal for a fact
    * table). This is the distributed equivalent: range-repartition on the
    * sort key, rank locally per partition, then add broadcasted partition
    * offsets. Two passes over the data, no single-task bottleneck.
    * Result is identical to `row_number().over(Window.orderBy(sortCols))`
    * for a total (tie-free) sort key (verified by SkewAndIvfSpec). */
  def distributedRowNumber(df: DataFrame, numPartitions: Int,
                           sortCols: org.apache.spark.sql.Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // localCheckpoint pins the partitioning: repartitionByRange SAMPLES
    // its boundaries per execution, so running the counts action and the
    // ranking action over un-materialized lineage would rank against
    // offsets from a DIFFERENT partitioning (verified: two executions of
    // the same lineage produced different partition sizes)
    val parted = df
      .repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = parted.withColumn("__local_rn",
      row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*)))
    // pass 1: per-partition counts -> prefix offsets (tiny, driver-safe)
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    val offDf = df.sparkSession.createDataFrame(offsets).toDF("__pid", "__off")
    local
      .join(broadcast(offDf), Seq("__pid"), "left")
      .withColumn("rn", col("__local_rn") + coalesce(col("__off"), lit(0L)))
      .drop("__pid", "__local_rn", "__off")
  }

  /** Two-phase skewed aggregation: count per (key, salt) map-side-style,
    * then merge per key — the classic fix when one group holds most rows
    * and a single reducer would own it. */
  def saltedCount(df: DataFrame, key: String, salt: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("partial"))
      .groupBy(col(key)).agg(sum(col("partial")).as("cnt"))
}
