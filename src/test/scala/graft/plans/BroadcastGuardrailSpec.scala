package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** BroadcastGuardrail: explicit BROADCAST hints on relations estimated
  * past the cap are stripped (join degrades to a shuffle join); hints
  * under the cap — and all hints with the guardrail disabled — are
  * honored verbatim. Results must be identical either way.
  */
class BroadcastGuardrailSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BroadcastGuardrail()
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[BroadcastGuardrail])
      spark.conf.unset("spark.graft.broadcastGuardrail.maxBytes")
    }
  }

  private def hintedJoin = {
    val li = Tables.lineitem(spark, sf())
    val ords = Tables.orders(spark, sf())
    li.join(broadcast(ords), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
  }

  test("oversized BROADCAST hint is stripped; join degrades to shuffle") {
    withRule {
      spark.conf.set("spark.graft.broadcastGuardrail.maxBytes", "1")
      // prevent AUTO broadcast so the only broadcast path is the hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = hintedJoin.queryExecution.executedPlan.treeString
        assert(!plan.contains("BroadcastHashJoin"),
          s"hint above the cap must not broadcast:\n$plan")
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("hint under the cap is honored; disabled guardrail honors any hint") {
    withRule {
      spark.conf.set("spark.graft.broadcastGuardrail.maxBytes", "8g")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        assert(hintedJoin.queryExecution.executedPlan.treeString
          .contains("BroadcastHashJoin"))
        spark.conf.set("spark.graft.broadcastGuardrail.maxBytes", "")
        assert(hintedJoin.queryExecution.executedPlan.treeString
          .contains("BroadcastHashJoin"))
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("stripping the hint never changes results") {
    val want = hintedJoin.collect().map(r => (r.getString(0), r.getLong(1))).sorted
    withRule {
      spark.conf.set("spark.graft.broadcastGuardrail.maxBytes", "1")
      val got = hintedJoin.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(got === want)
    }
  }
}
