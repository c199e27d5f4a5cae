package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (north star, BASELINE.json): image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-batched
  * functions over the binary payloads.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake (`fakeDecode`) — the Spark-side
  * plumbing (schema, partitioning, batch shape, typed mapPartitions) is
  * real and tested, and swapping `fakeDecode` for a JNI/codec call changes
  * nothing structural. This is the Scala analog of a Pandas-UDF
  * `mapInPandas` stage: per-partition batching amortizes per-row setup
  * (codec init happens once per partition, not per row).
  *
  * Scale notes: binary payloads dominate row size — `repartition` by a
  * hash of the id before heavy decode stages to balance skewed media
  * sizes; never collect; feature vectors (fixed 32 floats) are ~1000×
  * smaller than payloads, so extract early and drop the binary column
  * before any shuffle.
  */
object MultimodalOps {

  /** Output row of the feature-extraction stage. */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      byte_len: Int,
      features: Array[Float])

  val mediaSchema: StructType = new StructType()
    .add("media_id", LongType)
    .add("payload", BinaryType)
    .add("meta", new StructType()
      .add("format", StringType)
      .add("width", IntegerType)
      .add("height", IntegerType))

  /** Synthesize a deterministic media table from `documents` — stands in
    * for an ingested image/audio table (payload = pseudo-encoded bytes).
    * Pure column expressions; no driver-side data generation. */
  def attachMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      // ??? real ingestion reads encoded bytes from storage; the fake
      // payload is the UTF-8 text replicated to a size set by n_chars
      encode(concat(lit("IMG0"), col("text")), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "png").otherwise("jpeg").as("format"),
        (col("n_chars") % 640 + 32).cast("int").as("width"),
        (col("n_chars") % 480 + 32).cast("int").as("height")).as("meta"))

  /** STUB decode: a real implementation calls the codec here (jpeg →
    * pixel array). Deterministic fake: the "pixels" are the payload bytes
    * themselves. Marked per the brief — structure real, codec faked. */
  private def fakeDecode(payload: Array[Byte]): Array[Byte] = payload

  /** Feature extraction over media payloads: decode (stubbed) + 32-bin
    * byte histogram, L1-normalized — batch-shaped via typed
    * `mapPartitions` so decoder setup is once-per-partition. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "meta.format")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // once-per-partition setup (codec init in a real decoder)
        val bins = 32
        it.map { case (id, payload, fmt) =>
          val pixels = fakeDecode(payload)
          val hist = new Array[Float](bins)
          var i = 0
          while (i < pixels.length) {
            hist((pixels(i) & 0xff) * bins / 256) += 1f
            i += 1
          }
          val n = math.max(1, pixels.length).toFloat
          var b = 0
          while (b < bins) { hist(b) /= n; b += 1 }
          MediaFeatures(id, fmt, payload.length, hist)
        }
      }
  }

  /** `multimodal_stats`: per-format media inventory — counts, payload
    * bytes, dimension sums — the audit every media corpus run logs. The
    * first multimodal query with an EXACT oracle: binary payloads flow
    * through plain relational aggregation (`length` on binary = byte
    * count), and the synthetic payload is column-expressible so DuckDB
    * replays it. One scan, one partial+final agg — no decode on this
    * path, which is the point: inventory must not pay codec cost. */
  def mediaStats(documents: DataFrame): DataFrame =
    attachMedia(documents)
      .select(col("meta.format").as("format"),
        length(col("payload")).as("bytes"),
        col("meta.width").as("w"), col("meta.height").as("h"))
      .groupBy("format")
      .agg(count(lit(1)).as("n"),
        sum(col("bytes")).as("total_bytes"),
        sum(col("w")).as("sum_width"),
        sum(col("h")).as("sum_height"))
      .orderBy("format")

  /** `multimodal_features` query surface: stable projection of the
    * feature extraction (rows-only check; ScalaTest asserts values). */
  def features(documents: DataFrame): DataFrame =
    extractFeatures(attachMedia(documents)).toDF()
      .select(col("media_id"), col("format"), col("byte_len"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), 32).cast("double"), 6).as("f31"))
      .orderBy("media_id")

  /** Output row of the resize stage. */
  final case class ResizedMedia(
      media_id: Long,
      width: Int,
      height: Int,
      byte_len: Int,
      checksum: Long)

  /** Resize stage: decode (stubbed) → downsample to the target dims →
    * re-encode (stubbed). The fake resample keeps every `ratio`-th byte,
    * where ratio follows the source/target area ratio — so output size
    * tracks the real operation's shape deterministically. Same
    * partition-batched typed form as [[extractFeatures]]: a real codec
    * slots into `fakeDecode`/the sampling loop with no structural change. */
  def resize(media: DataFrame, targetW: Int = 64, targetH: Int = 64): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "meta.width", "meta.height")
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, payload, w, h) =>
          val pixels = fakeDecode(payload)
          val ratio = math.max(1L,
            (w.toLong * h.toLong) / (targetW.toLong * targetH.toLong)).toInt
          val out = new Array[Byte]((pixels.length + ratio - 1) / ratio)
          var i = 0
          var o = 0
          while (i < pixels.length) {
            out(o) = pixels(i); o += 1; i += ratio
          }
          var sum = 0L
          var j = 0
          while (j < out.length) { sum = (sum * 31 + (out(j) & 0xff)) & 0xFFFFFFFFL; j += 1 }
          ResizedMedia(id, targetW, targetH, out.length, sum)
        }
      }
  }

  /** `multimodal_resize` query surface (rows-only; ScalaTest asserts
    * determinism, target dims, and size reduction). */
  def resized(documents: DataFrame): DataFrame =
    resize(attachMedia(documents)).toDF()
      .orderBy("media_id")

  /** Frame sampling for video-shaped payloads: split the byte stream into
    * fixed-size "frames" and keep every `stride`-th — the decode of real
    * container formats is the stubbed part; the explode/partition shape is
    * what survives at scale (one output row per sampled frame). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = floor(length(col("payload")) / frameBytes).cast("int")
    media
      // payloads shorter than one frame emit nothing (all emitted frames
      // are exactly frameBytes — no truncated pseudo-frame)
      .filter(nFrames > 0)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), nFrames - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(
        col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
  }

  /** `multimodal_frames` query surface (rows-only). */
  def frames(documents: DataFrame): DataFrame =
    sampleFrames(attachMedia(documents))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).as("frame_len"),
        crc32(col("frame")).as("frame_crc"))
      .orderBy("media_id", "frame_idx")
}
