package graft.operators

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
}
