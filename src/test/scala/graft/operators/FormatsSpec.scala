package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Source/sink format breadth beyond parquet: JSON-lines and CSV write →
  * read round-trips preserve values and (with explicit schema) types.
  * The testdata ships as parquet only, so these specs generate the files
  * from it — the point is the format plumbing, not new data.
  */
class FormatsSpec extends SparkSpec {

  private def orders1996 = Tables.orders(spark, sf())
    .filter(year(col("o_orderdate")) === 1996)
    .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")

  test("partitioned parquet sink: a partition-key filter prunes at the source") {
    // at 100 TB the corpus is laid out partitioned (by lang/source/date);
    // a predicate on the partition key must become a PartitionFilter on
    // the scan — directory pruning, zero I/O on other partitions — not a
    // post-scan row filter
    val dir = Files.createTempDirectory("graft-partby").toString
    val docs = Tables.documents(spark, sf())
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(back.count() === docs.filter(col("lang") === "en").count())
    val plan = back.queryExecution.executedPlan.treeString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter did not reach PartitionFilters:\n$plan")
    // the row-level PushedFilters must NOT re-check lang — it is fully
    // satisfied by pruning
    assert(!plan.replaceAll("(?s).*PushedFilters", "").contains("lang"),
      s"partition key leaked into row-level pushdown:\n$plan")
  }

  test("JSON-lines sink + source round-trip") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val src = orders1996
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.count() === src.count())
    assert(back.schema === src.schema)
    assert(back.orderBy("o_orderkey").collect().map(_.toString).toSeq ===
      src.orderBy("o_orderkey").collect().map(_.toString).toSeq)
  }

  test("CSV sink + source round-trip (header + explicit schema)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = orders1996
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    assert(back.count() === src.count())
    assert(back.schema === src.schema)
    assert(back.orderBy("o_orderkey").collect().map(_.toString).toSeq ===
      src.orderBy("o_orderkey").collect().map(_.toString).toSeq)
  }

  test("ORC sink + source round-trip (typed columnar alternative to parquet)") {
    val dir = Files.createTempDirectory("graft-orc").toString
    val src = orders1996
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema === src.schema) // ORC is self-describing, no schema opt
    assert(back.orderBy("o_orderkey").collect().map(_.toString).toSeq ===
      src.orderBy("o_orderkey").collect().map(_.toString).toSeq)
    // pushdown parity with parquet: predicates reach the ORC scan too
    val plan = back.filter(col("o_totalprice") > 100000.0)
      .queryExecution.executedPlan.treeString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice,100000.0)]"),
      s"filter not pushed into ORC scan:\n$plan")
  }

  test("CSV schema inference parses numerics; explicit schema remains the contract") {
    val dir = Files.createTempDirectory("graft-csv-inf").toString
    orders1996.write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    // inference lands on workable types (ints may widen/narrow — that is
    // exactly why production reads pin an explicit schema)
    assert(inferred.schema("o_totalprice").dataType.typeName === "double")
    assert(inferred.count() === orders1996.count())
  }
}
