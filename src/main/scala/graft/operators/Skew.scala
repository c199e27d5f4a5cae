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

  /** Two-phase skewed aggregation: count per (key, salt) map-side-style,
    * then merge per key — the classic fix when one group holds most rows
    * and a single reducer would own it. */
  def saltedCount(df: DataFrame, key: String, salt: Int = 8): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("partial"))
      .groupBy(col(key)).agg(sum(col("partial")).as("cnt"))
}
