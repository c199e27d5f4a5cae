package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Proves the SCALE.md claim that bucketing both sides of a fact⋈fact
  * join on the key removes BOTH exchanges: the bucketed scans already
  * satisfy the join's hash-partitioning requirement, so the planner emits
  * a sort-merge join with zero Exchange operators — the co-located-join
  * layout a 100 TB deployment uses for its recurring fact joins.
  */
class BucketedJoinSpec extends SparkSpec {

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
