package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed semantic pins for the round-14 fixes. */
class RoundFourteenOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline_dpo_format: NULL-lang docs leave the salt tier's output identical to the window path") {
    // r13 ADVICE: the salt tier joined counts onto the UNION of both
    // branches with a null-rejecting equi-join, so NULL-lang rows
    // vanished from the ranked table whenever a mega-language
    // activated the tier — contradicting the 'NULL lang stays on the
    // window path' contract. The fix computes n with the count window
    // on the window branch (exactly the common path) and joins counts
    // only onto the mega branch (whose langs are non-null by
    // construction). The user-visible output drops NULL-lang pairs at
    // the final lang-keyed pairing in BOTH tiers; this pins the
    // tiers equal in the presence of NULL lang, mega lang, and a
    // normal lang together.
    val docs = Seq(
      (1L, "a a a a", "en"), (2L, "a b c d", "en"), (3L, "a b a b", "en"),
      (4L, "x y z x", "en"), (5L, "x y z w", "en"), (6L, "x x y z", "en"),
      (7L, "u v w x", "fr"), (8L, "u u v w", "fr"),
      (9L, "p q r s", null), (10L, "p p q r", null))
      .map { case (id, t, l) => (id, t, l, "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).toSeq
    val base = rows(CorpusOps.dpoFormat(docs))
    assert(base.nonEmpty)
    val conf = spark.conf
    try {
      conf.set("spark.graft.dpo.maxLangRows", "3") // en (6 docs) salts
      assert(rows(CorpusOps.dpoFormat(docs)) === base)
    } finally conf.unset("spark.graft.dpo.maxLangRows")
  }

  test("pipeline_pack_sequences: hand-computed next-fit-decreasing on two ranges + an oversize doc") {
    // budget 10, 2 ranges. Fit docs ranked (n DESC, id):
    // 1(7) 2(6) 3(5) | 4(4) 5(3) -> ceil(5/2)=3 per range.
    // Range 0 next-fit: 7 -> bin0; 7+6>10 -> bin1; 6+5>10 -> bin2 (3 bins).
    // Range 1: 4 -> bin0; 4+3=7<=10 -> bin0 (1 bin, global id 3).
    // Doc 6 (12 tokens) overflows the budget -> explicit oversize row.
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, txt(7)), (2L, txt(6)), (3L, txt(5)),
      (4L, txt(4)), (5L, txt(3)), (6L, txt(12)))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.packSequences(docs, budget = 10, nRanges = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    assert(got === Seq(
      (1L, 7L, 0L, 0L, 0), (2L, 6L, 0L, 1L, 0), (3L, 5L, 0L, 2L, 0),
      (4L, 4L, 1L, 3L, 0), (5L, 3L, 1L, 3L, 0), (6L, 12L, -1L, -1L, 1)))
  }

  test("pipeline_pack_sequences: every bin's fill respects the budget on the real corpus") {
    val docs = graft.Tables.documents(spark, sf())
    val out = CorpusOps.packSequences(docs) // budget 256
    val overfilled = out.filter(col("oversize") === 0)
      .groupBy("bin_id").agg(sum(col("n_tokens")).as("fill"))
      .filter(col("fill") > 256).count()
    assert(overfilled == 0L, "a bin exceeded the strict budget")
    // every oversize row really is over budget, and nothing is dropped
    assert(out.filter(col("oversize") === 1 && col("n_tokens") <= 256)
      .count() == 0L)
    assert(out.count() == docs.count())
  }
}
