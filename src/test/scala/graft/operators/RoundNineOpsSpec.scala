package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-9 operators: the model-tier quality/PII scorer (the last
  * unstarted ROADMAP deferral — batched inference plumbing with a
  * deterministic integer model). */
class RoundNineOpsSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())

  test("qualityModel: batched inference matches the closed-form column score") {
    // the mapPartitions batching must be a pure plumbing detail: any
    // batch size produces exactly the closed-form logit
    val sess = spark
    import sess.implicits._
    val expected = docs.select(
      col("doc_id"),
      (lit(2L) * size(filter(split(col("text"), " "), w => w =!= "")) +
        lit(5L) * size(filter(split(lower(col("text")), " "),
          w => w === "the" || w === "a" || w === "of" || w === "to")) +
        lit(-30L) * (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))) +
        lit(-1000L) * (regexp_count(col("text"),
          lit("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""")) +
          regexp_count(col("text"), lit("""\d{9,}"""))) +
        lit(-127L)).cast("long").as("logit"))
      .as[(Long, Long)].collect().toMap
    Seq(1, 7, 256, 100000).foreach { bs =>
      val got = TextOps.qualityModel(docs, batchSize = bs)
        .select("doc_id", "logit").as[(Long, Long)].collect().toMap
      assert(got == expected, s"batchSize=$bs diverged from closed form")
    }
  }

  test("qualityModel: planted PII and digit-heavy docs are dropped; prose kept") {
    val sess = spark
    import sess.implicits._
    val planted = Seq(
      // natural prose: many words + stopwords, no digits — keep
      (1L, ("the quick brown fox jumps over the lazy dog and runs to " +
        "the river of a thousand winding paths ") * 4),
      // same prose with one email: the -1000 PII weight must sink it
      (2L, ("the quick brown fox jumps over the lazy dog and runs to " +
        "the river of a thousand winding paths ") * 4 +
        "contact me at fox.hunter@example.com"),
      // digit table: -30/digit buries the word score — drop
      (3L, "row 1234 5678 24 68 13 57 90 " * 8),
      // long id run counts as PII (card/id shaped) AND digits — drop
      (4L, "the order of the day is a big number 98765432109876 to note")
    ).toDF("doc_id", "text")
    val out = TextOps.qualityModel(planted).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(1L) == "keep", "clean prose must be kept")
    assert(out(2L) == "drop", "an email must sink an otherwise-keep doc")
    assert(out(3L) == "drop", "digit-heavy doc must drop")
    assert(out(4L) == "drop", "long id run must drop")
  }

  test("qualityModel: map-only plan — no shuffle before the display sort") {
    val plan = TextOps.qualityModel(docs).queryExecution.optimizedPlan.toString
    // exactly one Sort (the final orderBy) and no Aggregate/Join anywhere;
    // inference is mapPartitions over projected vectors, the corpus text
    // never crosses a stage boundary
    assert(!plan.contains("Join") && !plan.contains("Aggregate"),
      s"qualityModel should be map-only:\n$plan")
    val exec = TextOps.qualityModel(docs).queryExecution.executedPlan.treeString
    assert("Exchange".r.findAllIn(exec).size <= 1, // the global sort only
      s"unexpected shuffles in qualityModel:\n$exec")
  }
}
