package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Proves the SCALE.md table-layout claims: bucketing both sides of a
  * fact⋈fact join removes BOTH exchanges, and a partitioned layout
  * prunes non-matching partitions at the scan — the two physical-layout
  * levers a 100 TB deployment pulls before touching any operator code.
  */
class BucketedJoinSpec extends SparkSpec {

  test("partitioned table layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-partitioned").toString
    Tables.orders(spark, sf())
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("yr") === 1996)
    val plan = pruned.queryExecution.executedPlan.treeString
    // the year predicate must be a PartitionFilter (directory pruning),
    // not a row-level PushedFilter — non-1996 files are never opened
    assert(plan.contains("PartitionFilters: [isnotnull(yr"), plan)
    assert(plan.contains("(yr") && plan.contains("= 1996"), plan)
    val expected = Tables.orders(spark, sf())
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() === expected)
    assert(expected > 0)
  }

  test("co-bucketed tables sort-merge join with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft-bucketed").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-sensitive SMJ path (a broadcast join would hide
    // the exchange question entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf()).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
      Tables.customer(spark, sf()).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/b_customer").mode("overwrite").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.treeString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")

      val expected = Tables.orders(spark, sf())
        .join(Tables.customer(spark, sf()), col("o_custkey") === col("c_custkey"))
        .count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
