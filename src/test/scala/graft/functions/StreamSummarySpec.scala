package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Unit guarantees of the mutable Metwally stream-summary (r8 verdict
  * #4: the immutable-Map buffer paid O(capacity) per evicted row; this
  * layout is O(1)/row). The Spark-level guarantees (against exact
  * counts, through shuffle + merge) live in RoundEightOpsSpec — these
  * pin the structure itself: exactness under capacity, the
  * Space-Saving error invariants over an adversarial eviction-heavy
  * stream, and the flat serialization round-trip the shuffle uses.
  */
class StreamSummarySpec extends AnyFunSuite {

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("under capacity the sketch is exact (err 0, every key present)") {
    val s = new StreamSummary(64)
    val xs = Seq.tabulate(300)(i => s"k${i % 20}")
    xs.foreach(s.offer)
    val exact = exactCounts(xs)
    val got = s.ranked
    assert(got.size == 20)
    got.foreach { case (k, c, e) =>
      assert(c == exact(k), s"$k: $c != ${exact(k)}")
      assert(e == 0L, s"$k: err $e on an under-capacity sketch")
    }
  }

  test("eviction-heavy stream keeps the Space-Saving invariants") {
    // skewed stream with cardinality >> capacity: 8 heavy keys inside a
    // flood of singletons — the regime the bucket layout exists for
    val cap = 32
    val s = new StreamSummary(cap)
    val rnd = new scala.util.Random(7)
    val xs = scala.collection.mutable.ArrayBuffer[String]()
    (1 to 20000).foreach { i =>
      if (rnd.nextInt(100) < 40) xs += s"heavy${rnd.nextInt(8)}"
      else xs += s"tail$i"
    }
    xs.foreach(s.offer)
    val n = xs.size.toLong
    val exact = exactCounts(xs.toSeq)
    assert(s.size == cap)
    s.ranked.foreach { case (k, est, err) =>
      val truth = exact.getOrElse(k, 0L)
      assert(est >= truth, s"$k underestimated: $est < $truth")
      assert(est - err <= truth, s"$k err bound: est=$est err=$err true=$truth")
      assert(err <= n / cap, s"$k err $err > n/cap=${n / cap}")
    }
    // no false negatives above n/cap
    val present = s.ranked.map(_._1).toSet
    exact.filter(_._2 > n / cap).keys.foreach(k =>
      assert(present.contains(k), s"heavy key $k missing"))
    // monotone rank order, count desc
    val counts = s.ranked.map(_._2)
    assert(counts == counts.sortBy(-_))
  }

  test("serialization round-trips content exactly (the shuffle path)") {
    val s = new StreamSummary(16)
    val rnd = new scala.util.Random(11)
    (1 to 5000).foreach(_ => s.offer(s"k${rnd.nextInt(200)}"))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(s)
    oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val s2 = in.readObject().asInstanceOf[StreamSummary]
    assert(s2.capacity == s.capacity)
    assert(s2.ranked == s.ranked, "round-trip changed sketch content")
    // the deserialized sketch must still be operable AND behave like the
    // original (recency order preserved by the tail→head write order)
    (1 to 100).foreach(i => { s.offer(s"post$i"); s2.offer(s"post$i") })
    assert(s2.ranked == s.ranked, "post-round-trip divergence")
  }

  test("merge keeps overestimate-only and truncates deterministically") {
    val a = new StreamSummary(16)
    val b = new StreamSummary(16)
    val xsA = Seq.tabulate(4000)(i => if (i % 3 == 0) s"h${i % 5}" else s"a$i")
    val xsB = Seq.tabulate(4000)(i => if (i % 4 == 0) s"h${i % 5}" else s"b$i")
    xsA.foreach(a.offer)
    xsB.foreach(b.offer)
    val merged = a.mergeWith(b)
    assert(merged.size <= 16)
    val exact = exactCounts(xsA ++ xsB)
    val n = (xsA.size + xsB.size).toLong
    merged.ranked.foreach { case (k, est, err) =>
      val truth = exact.getOrElse(k, 0L)
      assert(est >= truth, s"$k underestimated after merge: $est < $truth")
      assert(est - err <= truth, s"$k merge err bound: est=$est err=$err true=$truth")
    }
    // the heavy cross-partition keys survive the truncation
    (0 until 5).foreach(i => assert(merged.ranked.exists(_._1 == s"h$i"),
      s"cross-partition heavy key h$i lost in merge"))
    // deterministic: merging the same inputs again gives identical output
    val a2 = new StreamSummary(16)
    val b2 = new StreamSummary(16)
    xsA.foreach(a2.offer)
    xsB.foreach(b2.offer)
    assert(a2.mergeWith(b2).ranked == merged.ranked)
  }
}
