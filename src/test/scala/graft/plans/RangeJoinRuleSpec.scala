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

  test("wide factor spread stays bounded: log buckets, no Sequence blow-up") {
    // With the old fixed linear width=100, a (0.0001, 10000) factor pair
    // generated ~x*100 buckets per right row — Sequence hard-fails past
    // MAX_ROUNDED_ARRAY_LENGTH for large x (advisor finding). Log-domain
    // buckets span ln(1e8)/lnBase ≈ targetBucketsPerRow, statically.
    def wideJoin() = Tables.part(spark, sf("sf0.001"))
      .join(Tables.supplier(spark, sf("sf0.001")),
        col("p_retailprice") > col("s_acctbal") * 0.0001 &&
          col("p_retailprice") < col("s_acctbal") * 10000.0)
      .select("p_partkey", "s_suppkey")
    val expected = wideJoin().collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(expected.nonEmpty)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToBucket()
    try {
      val rewritten = wideJoin()
      val plan = rewritten.queryExecution.executedPlan.treeString
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
        s"rule did not fire:\n$plan")
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq === expected.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinToBucket])
    }
  }

  test("zeros and negatives on both sides survive the positivity routing") {
    import spark.implicits._
    // l = 0 ∧ x = 0 is a real match under both-inclusive bounds; negative
    // values never match a positive-factor band and are filtered, not
    // mis-bucketed through Log.
    val left = Seq(-5.0, 0.0, 1.0, 50.0).toDF("l")
    val right = Seq(-3.0, 0.0, 2.0, 100.0).toDF("x")
    def bandInclusive() = left.join(right,
      col("l") >= col("x") * 0.5 && col("l") <= col("x") * 2.0)
    val expected = bandInclusive().collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sorted
    assert(expected.contains((0.0, 0.0)), "fixture must exercise the zero-zero match")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToBucket()
    try {
      val rewritten = bandInclusive()
      assert(rewritten.queryExecution.optimizedPlan.treeString.contains("__bucket_l"))
      val got = rewritten.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
      assert(got.toSeq === expected.toSeq)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinToBucket])
    }
  }

  test("spark.graft.rangeJoin.enabled=false leaves the band join untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinToBucket()
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      assert(!bandJoin().queryExecution.optimizedPlan.treeString.contains("__bucket_l"))
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.enabled")
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
