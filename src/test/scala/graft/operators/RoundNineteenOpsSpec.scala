package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-19 reworks (VERDICT r18 Next #2/#5): the sort-free
  * window_running_sum plan and the one-pass dupSpans form carry
  * correctness obligations their plans can't state — pinned here. */
class RoundNineteenOpsSpec extends SparkSpec {

  test("window_running_sum: one exchange, no terminal sort, written order equals the oracle's ORDER BY (r19 Next #5)") {
    val li = Tables.lineitem(spark, sf())
    val df = Windows.runningSum(li)
    val got = df.collect() // also finalizes the AQE plan
    // the AQE treeString prints Final AND Initial plans — count nodes
    // in the final section only
    val plan = df.queryExecution.executedPlan.treeString
      .split("== Initial Plan ==").head
    // exactly ONE exchange — the explicit range repartition; the window
    // rides it (RangePartitioning(suppkey) satisfies its clustering)
    // and no terminal presentation exchange exists
    val exchanges = plan.linesIterator
      .filter(l => l.contains("Exchange ") && !l.contains("Reused")).toSeq
    assert(exchanges.size == 1 &&
      exchanges.head.contains("rangepartitioning(l_suppkey"),
      s"expected exactly the suppkey range exchange:\n$plan")
    // no GLOBAL sort node (global sorts print "], true," — the explicit
    // within-partition sort prints "], false,")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Sort [") && l.contains("], true,")),
      s"terminal global sort crept back in:\n$plan")
    // the load-bearing claim: what the plan EMITS (partition order ×
    // in-partition order — exactly what Verify writes to parquet and
    // the driver's row-ordered compare reads back) equals the oracle's
    // total ORDER BY. collect() concatenates partitions in index order,
    // so `got` IS the written order.
    val expected = Windows.runningSum(li)
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
      .collect()
    // (suppkey, orderkey, linenumber) is not a total order over ties —
    // compare via the oracle's full-key recompute instead: re-derive
    // rows with their full sort key and order totally
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val oracleOrdered = li
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))).over(w)
          .cast("double").as("running_rev"),
        col("l_shipdate"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_rev")
      .collect()
    assert(got.length == oracleOrdered.length && got.length > 0)
    assert(got.map(_.toString).toSeq == oracleOrdered.map(_.toString).toSeq,
      "written row order diverged from the oracle's total ORDER BY")
    assert(expected.map(_.toString).sorted.toSeq ==
      got.map(_.toString).sorted.toSeq, "row multiset changed")
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.treeString.split("== Initial Plan ==").head
  }

  private def assertOneRangeExchangeNoGlobalSort(
      plan: String, rangeKey: String): Unit = {
    val exchanges = plan.linesIterator
      .filter(l => l.contains("Exchange ") && !l.contains("Reused")).toSeq
    assert(exchanges.size == 1 &&
      exchanges.head.contains(s"rangepartitioning($rangeKey"),
      s"expected exactly the $rangeKey range exchange:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Sort [") && l.contains("], true,")),
      s"terminal global sort crept back in:\n$plan")
  }

  test("window_range_frame: one exchange, no terminal sort, written order equals the oracle's ORDER BY (r19 optimization)") {
    val li = Tables.lineitem(spark, sf())
    val df = Windows.rangeFrame(li)
    val got = df.collect()
    assertOneRangeExchangeNoGlobalSort(
      df.queryExecution.executedPlan.treeString
        .split("== Initial Plan ==").head, "l_suppkey")
    // written order must equal the oracle's total ORDER BY. Rows tied on
    // (suppkey, extendedprice, orderkey, linenumber) emit IDENTICAL
    // output tuples (peers share the value-based frame), so a
    // positional string compare against the key-ordered recompute is
    // exact even across ties.
    val expected = li
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"),
        expr("""CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                |  PARTITION BY l_suppkey ORDER BY l_extendedprice
                |  RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS DOUBLE)"""
          .stripMargin).as("qty_near"))
      .orderBy("l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber", "qty_near")
      .collect()
    assert(got.length == expected.length && got.length > 0)
    assert(got.map(_.toString).toSeq == expected.map(_.toString).toSeq,
      "written row order diverged from the oracle's total ORDER BY")
  }

  test("window_percent_cume: one exchange, no pin, no terminal sort, written order equals the oracle's ORDER BY (r19 optimization)") {
    val orders = Tables.orders(spark, sf())
    val df = Windows.percentCume(orders)
    val got = df.collect()
    assertOneRangeExchangeNoGlobalSort(
      df.queryExecution.executedPlan.treeString
        .split("== Initial Plan ==").head, "o_orderpriority")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    // o_orderkey is unique (checked against the generator), so the
    // presentation key is a true total order
    val expected = orders
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
      .select("o_orderkey", "o_orderpriority", "pr", "cd")
      .collect()
    assert(got.length == expected.length && got.length > 0)
    assert(got.map(_.toString).toSeq == expected.map(_.toString).toSeq,
      "written row order diverged from the oracle's total ORDER BY")
  }

  test("spanRewrite packed-key domain guard raises on out-of-domain doc_id (ADVICE r18 #1)") {
    import spark.implicits._
    val bad = Seq(
      (-1L, "alpha beta gamma delta epsilon zeta", "en"),
      (3L, "alpha beta gamma delta epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang")
    val e = intercept[Exception] {
      DedupOps.spanRewrite(bad, k = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("packed-key domain")),
      s"expected the domain raise, got: $e")
    // and the in-domain corpus still works
    val ok = Seq((3L, "alpha beta gamma delta epsilon zeta", "en"))
      .toDF("doc_id", "text", "lang")
    assert(DedupOps.spanRewrite(ok, k = 3).collect().nonEmpty)
  }
}
