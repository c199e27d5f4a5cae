package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The band-join rewrite rule: same rows as the nested-loop plan, no
  * nested loop in the physical plan, and no effect on non-matching
  * joins. */
class RangeJoinRuleSpec extends SparkSpec {

  private def bandJoin() = Tables.part(spark, sf("sf0.01"))
    .join(Tables.supplier(spark, sf("sf0.01")),
      col("p_retailprice") > col("s_acctbal") * 0.1 &&
        col("p_retailprice") < col("s_acctbal") * 0.11)
    .select("p_partkey", "s_suppkey")

  test("rewritten band join returns exactly the nested-loop join's rows") {
    val expected = bandJoin().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToBucket()
    try {
      val rewritten = bandJoin()
      val plan = rewritten.queryExecution.executedPlan.treeString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      assert(plan.contains("Generate explode"), plan)
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === expected.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinToBucket])
    }
  }

  test("inclusive bounds (BETWEEN shape) rewrite too, preserving boundary semantics") {
    def inclusiveJoin() = Tables.part(spark, sf("sf0.01"))
      .join(Tables.supplier(spark, sf("sf0.01")),
        col("p_retailprice") >= col("s_acctbal") * 0.1 &&
          col("p_retailprice") <= col("s_acctbal") * 0.11)
      .select("p_partkey", "s_suppkey")
    val expected = inclusiveJoin().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToBucket()
    try {
      val rewritten = inclusiveJoin()
      assert(rewritten.queryExecution.optimizedPlan.treeString.contains("__bucket_l"))
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === expected.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinToBucket])
    }
  }

  test("rule leaves equi joins and one-sided inequalities untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToBucket()
    try {
      val equi = Tables.orders(spark, sf()).join(Tables.customer(spark, sf()),
        col("o_custkey") === col("c_custkey"))
      assert(!equi.queryExecution.optimizedPlan.treeString.contains("__bucket_l"))
      val oneSided = Tables.part(spark, sf()).join(Tables.supplier(spark, sf()),
        col("p_retailprice") > col("s_acctbal") * 0.1)
      assert(!oneSided.queryExecution.optimizedPlan.treeString.contains("__bucket_l"))
      // and the one-sided join still computes
      assert(oneSided.limit(1).count() === 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinToBucket])
    }
  }
}
