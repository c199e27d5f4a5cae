package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Composed multi-operator analytical queries — classic TPC-H shapes
  * (Q3/Q5/Q10) adapted to the generated schema. These are the "everything
  * at once" checks: multi-way joins + selective filters + decimal-exact
  * aggregation + top-k, one declarative plan each, so Catalyst gets to
  * prove filter pushdown, join reordering, broadcast selection and
  * partial aggregation compose correctly (the per-operator queries verify
  * each in isolation).
  *
  * Scale notes: dims (region/nation/customer-after-filter) broadcast;
  * the lineitem scan keeps its filters pushed (PlanGuardSpec-style
  * audit); top-k is TakeOrdered. Money sums are DECIMAL so results are
  * partitioning-independent. Dates are output as epoch seconds
  * (cross-engine rule, FIXTURES.md §3).
  */
object ComposedOps {

  private val cutoff = "1998-06-30 00:00:00"

  /** `q3_shipping_priority` (TPC-H Q3 shape): revenue of the top-10
    * not-yet-shipped orders of one market segment at `cutoff`. */
  def q3ShippingPriority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame): DataFrame =
    customer.filter(col("c_mktsegment") === "BUILDING")
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        unix_timestamp(col("o_orderdate")).as("order_date_s"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** `q5_local_supplier` (TPC-H Q5 shape): revenue per nation of one
    * region where the supplier is LOCAL to the customer (the classic
    * same-nation join between two independent dimension paths). */
  def q5LocalSupplier(region: DataFrame, nation: DataFrame,
                      customer: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, supplier: DataFrame): DataFrame =
    region.filter(col("r_name") === "ASIA")
      .join(nation, col("n_regionkey") === col("r_regionkey"))
      .join(customer, col("c_nationkey") === col("n_nationkey"))
      .join(orders, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))

  /** `q10_returned_items` (TPC-H Q10 shape): the top-20 customers by
    * revenue lost to returned items in a six-month window. */
  def q10ReturnedItems(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame): DataFrame =
    customer
      .join(orders, col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01 00:00:00").cast("timestamp"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(nation, col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
}
