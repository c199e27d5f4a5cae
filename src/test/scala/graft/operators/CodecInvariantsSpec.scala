package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PORTABLE codec contract (docs/SCALE.md "Multimodal codec
  * determinism across JDKs", r7 stretch #8): MultimodalSpec's MD5
  * goldens are a regression tripwire pinned to the OpenJDK ImageIO
  * writer class — a toolchain bump may legitimately change them. These
  * assertions are the invariants the scope note documents as
  * JDK-INDEPENDENT (decoded-pixel statistics over lossless PNG), derived
  * fresh on the current JDK rather than byte-compared: when a toolchain
  * bump lands, the byte goldens fail while this suite stays green, which
  * is exactly the documented signature of writer drift (re-pin the MD5s)
  * versus a real codec regression (this suite fails too).
  */
class CodecInvariantsSpec extends SparkSpec {

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

  test("features: 32-bin luminance histogram conserves mass, matches meta dims") {
    val media = MultimodalOps.attachImages(goldenDocs)
    val metaDims = media.select(col("media_id"), col("meta.width"), col("meta.height"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      assert(f.features.length === 32, s"media ${f.media_id}: bin count")
      assert(f.features.forall(v => v >= 0f && v <= 1f && !v.isNaN),
        s"media ${f.media_id}: bins out of [0,1]")
      val mass = f.features.map(_.toDouble).sum
      assert(math.abs(mass - 1.0) < 1e-3,
        s"media ${f.media_id}: histogram mass $mass != 1 (decode changed " +
          "pixel count or normalization)")
      assert((f.width, f.height) === metaDims(f.media_id),
        s"media ${f.media_id}: decoded dims disagree with typed metadata")
    }
  }

  test("features/resize/frames are run-to-run deterministic on this JDK") {
    // within-toolchain determinism — the precondition for the MD5 pins
    val media = MultimodalOps.attachImages(goldenDocs)
    def featRun() = MultimodalOps.extractFeatures(media).collect()
      .sortBy(_.media_id).map(f => f.features.toSeq).toSeq
    assert(featRun() === featRun())
    def resizeRun() = MultimodalOps.resize(media, 8, 8).collect()
      .sortBy(_.media_id).map(r => (r.media_id, r.checksum)).toSeq
    assert(resizeRun() === resizeRun())
    val vids = MultimodalOps.attachVideos(goldenDocs, nFrames = 4, frameW = 12, frameH = 10)
    def frameRun() = MultimodalOps.sampleFrames(vids, stride = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(5))).sortBy(t => (t._1, t._2)).toSeq
    assert(frameRun() === frameRun())
  }

  test("resize honors requested dims; frame sampling honors stride and frame dims") {
    val media = MultimodalOps.attachImages(goldenDocs)
    MultimodalOps.resize(media, 8, 8).collect().foreach { r =>
      assert(r.width === 8 && r.height === 8)
    }
    val vids = MultimodalOps.attachVideos(goldenDocs, nFrames = 4, frameW = 12, frameH = 10)
    val frames = MultimodalOps.sampleFrames(vids, stride = 2).collect()
    // 4 frames at stride 2 → frames 0 and 2 per media
    assert(frames.length === 3 * 2)
    frames.foreach { r =>
      assert(r.getInt(1) % 2 === 0, "sampled frame index must respect stride")
      assert((r.getInt(3), r.getInt(4)) === ((12, 10)),
        "decoded frame dims must match the container's typed dims")
    }
  }
}
