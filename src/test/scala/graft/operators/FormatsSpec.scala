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

  test("malformed JSON rows quarantine into _corrupt_record, not a job abort") {
    // at 100 TB malformed rows are a certainty, and one bad byte must
    // never kill the pipeline: PERMISSIVE mode (the default) nulls the
    // failed row and captures the raw text in the corrupt-record column
    // so a quarantine sink can keep it
    val dir = Files.createTempDirectory("graft-badjson").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-0.json"),
      java.util.Arrays.asList(
        """{"id": 1, "v": "ok"}""",
        """{"id": 2, "v": }""", // malformed
        """{"id": 3, "v": "fine"}"""))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, v STRING, _corrupt_record STRING")
    val back = spark.read.schema(schema).json(dir).cache()
    try {
      assert(back.count() === 3)
      assert(back.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(back.filter(col("_corrupt_record").isNull)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
      // FAILFAST is the opt-in strict mode for curated inputs
      val strict = spark.read.schema(
          org.apache.spark.sql.types.StructType(schema.fields.dropRight(1)))
        .option("mode", "FAILFAST").json(dir)
      intercept[org.apache.spark.SparkException](strict.collect())
    } finally back.unpersist()
  }

  test("parquet schema evolution: shards with added columns merge, old rows null") {
    // corpus shards gain columns over time (a new quality score, a new
    // tag); mergeSchema unions shard schemas and back-fills nulls —
    // no rewrite of historical shards
    val dir = Files.createTempDirectory("graft-evolve").toString
    val sess = spark
    import sess.implicits._
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/shard=a")
    Seq((3L, "gamma", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/shard=b")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("doc_id", "quality", "shard", "text"))
    val rows = merged.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.isNullAt(r.fieldIndex("quality"))))
    assert(rows.toSeq === Seq((1L, true), (2L, true), (3L, false)))
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
