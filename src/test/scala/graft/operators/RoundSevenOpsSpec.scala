package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-checked fixtures for the round-7 operators (`corpus_lang_drift`,
  * `corpus_eval_coverage`, `pipeline_curriculum`). The oracle gate
  * proves DuckDB equivalence on the real tables; these pin the exact
  * arithmetic and edge semantics on values small enough to verify by
  * hand.
  */
class RoundSevenOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String, String, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("langDrift: uniform source has KL 0; skewed source matches the closed form") {
    // corpus mix: 4 en + 2 de = (2/3, 1/3). src0 matches the mix exactly
    // (2 en, 1 de) -> KL 0; src1 is all-en (2 en) -> KL = ln(3/2)
    val df = docs(
      (1L, "x", "en", "src0"), (2L, "x", "en", "src0"), (3L, "x", "de", "src0"),
      (4L, "x", "en", "src1"), (5L, "x", "en", "src1"), (6L, "x", "de", "src2"))
    val out = CorpusOps.langDrift(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.length === 3)
    val byName = out.map(r => r._1 -> r).toMap
    assert(byName("src0")._2 === 3L && byName("src0")._3 === 2L)
    // per-term 6dp rounding: terms (2/3)ln(1) and (1/3)ln(1) are exactly 0
    assert(byName("src0")._4 === 0.0)
    // src1: one lang cell, term = 1.0 * ln((2*6)/(2*4)) = ln(1.5)
    val expected = BigDecimal(math.log(1.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byName("src1")._4 === expected)
    // src2: all-de single doc, term = ln((1*6)/(1*2)) = ln(3)
    val expected2 = BigDecimal(math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byName("src2")._4 === expected2)
  }

  test("evalCoverage: counts covered grams per eval doc; gramless eval docs emit no row") {
    // doc 0 (eval: 0 % 50 == 0) has trigrams {a b c, b c d}; the train
    // docs contain "a b c" but not "b c d" -> coverage 0.5.
    // doc 50 (eval) has only 2 words -> no trigram -> no output row.
    val df = docs(
      (0L, "a b c d", "en", "s"),
      (50L, "too short", "en", "s"),
      (7L, "train text with a b c inside", "en", "s"),
      (8L, "unrelated train content here", "en", "s"))
    val out = CorpusOps.evalCoverage(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0L, 2L, 1L, 0.5)))
  }

  test("evalCoverage: fully covered and fully novel eval docs bound the ratio") {
    val df = docs(
      (0L, "p q r", "en", "s"), // exactly one trigram, present in train
      (100L, "m n o", "en", "s"), // one trigram, absent from train
      (9L, "train has p q r too", "en", "s"))
    val out = CorpusOps.evalCoverage(df).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(0L) === 1.0 && out(100L) === 0.0)
  }

  test("curriculum: equal-count stages in length order, stats exact") {
    // 8 docs with lengths 1..8 (text = 'x' * len), 4 stages of 2
    val df = docs((1L to 8L).map(i => (i, "x" * i.toInt, "en", "s")): _*)
    val out = CorpusOps.curriculum(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1, 2L, 1L, 2L, 3L), (2, 2L, 3L, 4L, 7L),
      (3, 2L, 5L, 6L, 11L), (4, 2L, 7L, 8L, 15L)))
    // ragged total: 6 docs over 4 stages -> first two stages get 2 docs
    val ragged = docs((1L to 6L).map(i => (i, "x" * i.toInt, "en", "s")): _*)
    val r2 = CorpusOps.curriculum(ragged).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(r2.toSeq === Seq((1, 2L), (2, 2L), (3, 1L), (4, 1L)))
  }
}
