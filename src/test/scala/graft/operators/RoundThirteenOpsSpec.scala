package graft.operators

import graft.SparkSpec

/** Hand-computed semantic pins for the round-13 fixes and wave. */
class RoundThirteenOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bpe trainer/apply: pair-exhausted vocab early-stops and passes words through") {
    // r12 ADVICE: the ORACLE's unrolled iteration used to empty every
    // downstream CTE via CROSS JOIN top_k when the vocabulary ran out
    // of mergeable pairs before `merges` iterations. The fixed oracle
    // (LEFT JOIN ON TRUE + previous-encoding fallback) was verified in
    // DuckDB on exactly these fixtures; this spec pins the Spark side
    // to the same values so the engines provably agree on exhaustion.
    //
    // Fixture A: single-char words — ZERO pairs from iteration 1.
    val a = Seq((1L, "a b c a b"), (2L, "c c a")).toDF("doc_id", "text")
    assert(CorpusOps.bpeMerges(a).collect().isEmpty,
      "no pairs -> trainer must emit zero merges")
    val appA = CorpusOps.bpeApply(a).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(appA.toSeq === Seq(
      (1L, 5L, 5L, md5hex("a | b | c | a | b")),
      (2L, 3L, 3L, md5hex("c | c | a"))))

    // Fixture B: 2-char words exhaust after 2 of the default 5 merges
    // (iter1 a+b->ab cnt 4; iter2 c+d->cd cnt 3; then nothing).
    val b = Seq((1L, "ab ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val m = CorpusOps.bpeMerges(b).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(m.toSeq === Seq((1, "a", "b", "ab", 4L), (2, "c", "d", "cd", 3L)))
    val appB = CorpusOps.bpeApply(b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(appB.toSeq === Seq(
      (1L, 4L, 4L, md5hex("ab | ab | ab | cd")),
      (2L, 3L, 3L, md5hex("ab | cd | cd"))))
  }
}
