package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Multimodal plumbing: schema, batch shape, determinism of the stubbed
  * decode + feature extraction (the codec itself is faked — see
  * MultimodalOps).
  */
class MultimodalSpec extends SparkSpec {

  test("media table has the binary+metadata schema") {
    val media = MultimodalOps.attachMedia(Tables.documents(spark, sf()))
    assert(media.schema.fieldNames.toSeq === Seq("media_id", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName === "binary")
    val m = media.limit(1).collect()(0)
    assert(m.getStruct(2).getString(0).nonEmpty) // format
  }

  test("feature extraction is deterministic, L1-normalized, fixed width") {
    val media = MultimodalOps.attachMedia(Tables.documents(spark, sf()).limit(20))
    val f1 = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 20)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.features.toSeq === b.features.toSeq)
      assert(a.features.length === 32)
      assert(math.abs(a.features.sum - 1f) < 1e-3)
    }
  }

  test("frame sampling emits every stride-th fixed-size frame") {
    val media = MultimodalOps.attachMedia(Tables.documents(spark, sf()).limit(5))
    val frames = MultimodalOps.sampleFrames(media, frameBytes = 64, stride = 4)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 4 === 0))
    // all but possibly the tail frame are exactly frameBytes long
    val lens = frames.map(r => r.getAs[Array[Byte]](2).length)
    assert(lens.count(_ === 64) >= lens.length - 5)
  }

  test("resize hits target dims deterministically and never grows payloads") {
    val media = MultimodalOps.attachMedia(Tables.documents(spark, sf()).limit(20))
    val srcLens = media.select(col("media_id"), length(col("payload")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r1 = MultimodalOps.resize(media, 64, 64).collect().sortBy(_.media_id)
    val r2 = MultimodalOps.resize(media, 64, 64).collect().sortBy(_.media_id)
    assert(r1.length === 20)
    r1.zip(r2).foreach { case (a, b) => assert(a === b) } // deterministic
    r1.foreach { r =>
      assert(r.width === 64 && r.height === 64)
      assert(r.byte_len <= srcLens(r.media_id))
    }
    // smaller target → at most as many bytes kept
    val small = MultimodalOps.resize(media, 16, 16).collect()
      .map(r => r.media_id -> r.byte_len).toMap
    r1.foreach(r => assert(small(r.media_id) <= r.byte_len))
  }

  // Golden fixture: three tiny documents with every determinism-relevant
  // property pinned (ids, text bytes, n_chars). The goldens below are md5
  // hex digests of a canonical serialization of each op's FULL output on
  // this fixture — a future real-codec swap (replacing fakeDecode) must
  // change these in a reviewed commit, never silently.
  private def goldenDocs = {
    val sess = spark
    import sess.implicits._
    Seq(
      (1L, "alpha bravo charlie delta echo", "en"),
      (2L, "foxtrot golf hotel india juliet kilo", "en"),
      (3L, "lima mike november oscar papa quebec romeo", "de"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("golden"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("golden: features/resize/frames outputs are byte-pinned on the fixture") {
    val media = MultimodalOps.attachMedia(goldenDocs)
    val featStr = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
      .map(f => s"${f.media_id}|${f.format}|${f.byte_len}|" +
        f.features.map(v => f"$v%.6f").mkString(","))
      .mkString("\n")
    val resizeStr = MultimodalOps.resize(media, 8, 8).collect().sortBy(_.media_id)
      .map(r => s"${r.media_id}|${r.width}|${r.height}|${r.byte_len}|${r.checksum}")
      .mkString("\n")
    val frameStr = MultimodalOps.sampleFrames(media, frameBytes = 8, stride = 2)
      .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
      .map(r => s"${r.getLong(0)}|${r.getInt(1)}|" +
        r.getAs[Array[Byte]](2).map("%02x".format(_)).mkString)
      .mkString("\n")
    assert(md5(featStr) === "f6d3560be623137cf26ce62e11209ac5")
    assert(md5(resizeStr) === "426238f3ec812205bbf53903635bd94d")
    assert(md5(frameStr) === "f79ee66e166f7c77d67b0ca2b782d91a")
  }

  test("query surfaces return rows") {
    val docs = Tables.documents(spark, sf())
    assert(MultimodalOps.features(docs).count() === 500)
    assert(MultimodalOps.frames(docs).count() > 0)
    assert(MultimodalOps.resized(docs).count() === 500)
  }
}
