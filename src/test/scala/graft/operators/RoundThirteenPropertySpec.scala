package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property pins for the round-13 wave-2 operators: each distributed
  * plan is replayed against a straightforward single-threaded Scala
  * reference on fixed-seed random corpora (the ShingleKernelsSpec
  * pattern), so the semantics are pinned by an implementation with no
  * shared code — a different failure surface than the DuckDB oracle
  * (which pins cross-engine agreement, not intent). */
class RoundThirteenPropertySpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // small alphabet => dense span collisions, the interesting regime
  private val genDoc: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" ")))

  test("dedup_span_rewrite == single-threaded first-occurrence reference (3 seeds, k=5 and k=3)") {
    for (seed <- Seq(11L, 12L, 13L); k <- Seq(5, 3)) {
      val docs = (0L until 30L).map(i =>
        (i, sample(genDoc, seed * 100 + i), if (i % 2 == 0) "en" else "de"))
      // reference: spans in (doc_id, block_idx) order; a span survives
      // iff its text was never seen before (including earlier in the
      // SAME doc); docs with zero survivors vanish
      val seen = scala.collection.mutable.Set[String]()
      val expected = docs.sortBy(_._1).flatMap { case (id, text, lang) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        if (ws.isEmpty) None
        else {
          val blocks = ws.grouped(k).map(_.mkString(" ")).toSeq
          val kept = blocks.filter(seen.add)
          if (kept.isEmpty) None
          else Some((id, lang, blocks.size.toLong, kept.size.toLong,
            kept.map(_.split(" ").length.toLong).sum,
            md5hex(kept.mkString(" "))))
        }
      }
      val got = DedupOps.spanRewrite(
        docs.toDF("doc_id", "text", "lang"), k).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getString(5)))
      assert(got.toSeq === expected, s"seed=$seed k=$k")
    }
  }

  test("ts_gap_islands == brute-force islands over random day sets (3 seeds)") {
    val genDays: Gen[Set[Long]] =
      Gen.someOf(0L to 30L).map(_.toSet)
    for (seed <- Seq(21L, 22L, 23L)) {
      val perUser = (1L to 12L).map(u => u -> sample(genDays, seed * 50 + u))
        .filter(_._2.nonEmpty)
      val events = perUser.flatMap { case (u, days) =>
        days.toSeq.flatMap(d => Seq(
          (new java.sql.Timestamp(d * 86400000L), u),
          // same-day repeat at a different hour must collapse
          (new java.sql.Timestamp(d * 86400000L + 3600000L), u)))
      }
      val expected = perUser.sortBy(_._1).map { case (u, days) =>
        val sorted = days.toSeq.sorted
        // split into maximal consecutive runs
        val runs = sorted.foldLeft(List.empty[List[Long]]) {
          case (acc @ (h :: t), d) if h.head == d - 1 => (d :: h) :: t
          case (acc, d) => List(d) :: acc
        }.map(_.reverse).reverse
        val longest = runs.map(_.size).max.toLong
        (u, days.size.toLong, runs.size.toLong, longest,
          sorted.head, sorted.last,
          sorted.last - sorted.head + 1 - days.size)
      }
      val got = StreamBatchOps.gapIslands(events.toDF("ts", "user_id"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(got.toSeq === expected, s"seed=$seed")
    }
  }

  test("corpus_quality_reliability invariants: exhaustive partition, ntile-free decile formula, ordered logit spans") {
    val docs = (0L until 37L) // deliberately not divisible by 10
      .map(i => (i, sample(genDoc, 31L * 100 + i)))
      .toDF("doc_id", "text")
    val rows = TextOps.qualityReliability(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // every doc lands in exactly one decile
    assert(rows.map(_._2).sum == 37L)
    // decile ids obey the (rn-1)*10 DIV n formula's occupancy: sizes are
    // n DIV 10 or n DIV 10 + 1, and ids are sorted unique in 0..9
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted.distinct)
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(rows.forall(r => r._2 == 3L || r._2 == 4L))
    // gold hits bounded by the bucket, micro rate exact
    assert(rows.forall(r => r._3 >= 0 && r._3 <= r._2))
    assert(rows.forall(r => r._4 == r._3 * 1000000L / r._2))
    // logit spans are internally ordered and non-overlapping across
    // deciles except at ties (hi of d may equal lo of d+1)
    assert(rows.forall(r => r._5 <= r._6))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._6 <= b._5,
        s"decile ${a._1} hi ${a._6} > decile ${b._1} lo ${b._5}")
      case _ =>
    }
  }
}
