package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (north star, BASELINE.json): image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-batched
  * functions over the binary payloads.
  *
  * The codec is REAL as of round 5: JDK `javax.imageio` (public JDK API,
  * no extra dependency) encodes and decodes actual PNG/JPEG bytes — the
  * round-4 `fakeDecode` stub is gone. Image CONTENT is still synthesized
  * deterministically from the documents table (the sandbox has no real
  * image corpus; [[attachImages]] stands in for ingestion), but every
  * payload is a genuine encoded image and every downstream stage decodes
  * it for real: histogram features come from decoded luminance, resize
  * area-averages decoded pixels and re-encodes, frame sampling parses a
  * length-prefixed container of real encoded frames. This is the Scala
  * analog of a Pandas-UDF `mapInPandas` stage: per-partition batching
  * amortizes per-row setup (`ImageIO.setUseCache(false)` once per
  * partition — ImageIO's default disk-backed stream cache would add a
  * temp-file write per image).
  *
  * Scale notes: binary payloads dominate row size — `repartition` by a
  * hash of the id before heavy decode stages to balance skewed media
  * sizes; never collect; feature vectors (fixed 32 floats) are ~1000×
  * smaller than payloads, so extract early and drop the binary column
  * before any shuffle.
  */
object MultimodalOps {

  /** Typed media row (image payloads). */
  final case class MediaMeta(format: String, width: Int, height: Int)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Output row of the feature-extraction stage; width/height are the
    * REAL decoded dimensions, not metadata claims. */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      byte_len: Int,
      width: Int,
      height: Int,
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
    * Pure column expressions (no decode, no codec) — kept as the input of
    * [[mediaStats]] precisely because DuckDB can replay it, giving the
    * inventory query an EXACT oracle. */
  def attachMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(concat(lit("IMG0"), col("text")), "UTF-8").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "png").otherwise("jpeg").as("format"),
        (col("n_chars") % 640 + 32).cast("int").as("width"),
        (col("n_chars") % 480 + 32).cast("int").as("height")).as("meta"))

  /** Deterministic synthetic image: RGB gradients + a seed-keyed stripe
    * pattern — arithmetic only, so the same (seed, w, h) always renders
    * identical pixels on any executor. */
  private def synthImage(seed: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 255 / math.max(1, w - 1)) & 0xff
        val g = (y * 255 / math.max(1, h - 1)) & 0xff
        val b = ((seed * 31 + x * 7 + y * 13) % 256).toInt & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Per-PARTITION reusable codec pair (r15, the image analog of the r14
    * WAV 113× fix): `ImageIO.read`/`write` allocate a fresh
    * ImageInputStream, scan the plugin registry, and construct + dispose
    * a reader/writer PER CALL — on the small images of this corpus that
    * per-call ceremony costs more than the actual (de)code, and at sf10
    * the phash tier paid it ~10⁶ times (104.3 s driver-measured, r14 #1
    * query). One reader/writer per format per partition, input/output
    * rebound per payload; decode format sniffed from the payload's magic
    * byte (PNG starts 0x89, JPEG 0xFF). Pixel output is identical to
    * ImageIO.read — same plugin, same defaults — so the golden-pinned
    * specs (features/resize/frames/phash) hold unchanged. */
  private final class ImageCodec {
    ImageIO.setUseCache(false)
    private lazy val pngR = ImageIO.getImageReadersByFormatName("png").next()
    private lazy val jpegR = ImageIO.getImageReadersByFormatName("jpeg").next()
    private lazy val pngW = ImageIO.getImageWritersByFormatName("png").next()
    private lazy val jpegW = ImageIO.getImageWritersByFormatName("jpeg").next()

    def decode(payload: Array[Byte]): BufferedImage = {
      val reader = if ((payload(0) & 0xff) == 0x89) pngR else jpegR
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, true, true)
        val img = reader.read(0)
        require(img != null, "payload is not a decodable image")
        img
      } finally iis.close()
    }

    /** Decode straight to a packed RGB row-major array via ONE bulk
      * `getRGB` — the per-pixel `getRGB(x, y)` call re-enters the color
      * model per pixel, which dominates tight 8×8-downsample loops. */
    def decodeRgb(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = decode(payload)
      val w = img.getWidth
      val h = img.getHeight
      (w, h, img.getRGB(0, 0, w, h, null, 0, w))
    }

    def encode(img: BufferedImage, format: String): Array[Byte] = {
      val writer = if (format == "png") pngW else jpegW
      val baos = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.write(img) // default params — byte-identical to ImageIO.write
        ios.flush()
      } finally ios.close()
      baos.toByteArray
    }
  }

  /** Ingestion stand-in with REAL payloads: every row carries genuine
    * PNG (doc_id ≡ 0 mod 3) or JPEG bytes of a deterministic synthetic
    * image whose dimensions derive from the doc. Partition-batched typed
    * `mapPartitions`; encoder init (disabling ImageIO's temp-file cache)
    * happens once per partition. */
  def attachImages(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.map { case (id, nChars) =>
          val w = 24 + ((id + nChars) % 24).toInt
          val h = 16 + (id % 16).toInt
          val fmt = if (id % 3 == 0) "png" else "jpeg"
          MediaRow(id, codec.encode(synthImage(id, w, h), fmt), MediaMeta(fmt, w, h))
        }
      }.toDF()
  }

  /** Feature extraction over media payloads: REAL ImageIO decode + 32-bin
    * luminance histogram (integer Rec.601 weights: (299r + 587g + 114b)
    * / 1000), L1-normalized, plus the decoded width/height — batch-shaped
    * via typed `mapPartitions` so decoder setup is once-per-partition. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload", "meta.format")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        val codec = new ImageCodec
        val bins = 32
        it.map { case (id, payload, fmt) =>
          val (w, h, rgbs) = codec.decodeRgb(payload)
          val hist = new Array[Float](bins)
          var i = 0
          val n0 = w * h
          while (i < n0) {
            val rgb = rgbs(i)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(lum * bins / 256) += 1f
            i += 1
          }
          val n = math.max(1, w * h).toFloat
          var b = 0
          while (b < bins) { hist(b) /= n; b += 1 }
          MediaFeatures(id, fmt, payload.length, w, h, hist)
        }
      }
  }

  /** `multimodal_stats`: per-format media inventory — counts, payload
    * bytes, dimension sums — the audit every media corpus run logs. The
    * one multimodal query with an EXACT oracle: binary payloads flow
    * through plain relational aggregation (`length` on binary = byte
    * count), and the synthetic payload is column-expressible so DuckDB
    * replays it. One scan, one partial+final agg — no decode on this
    * path, which is the point: inventory must not pay codec cost.
    *
    * scan-guard: multimodal_stats */
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

  /** `multimodal_features` query surface: stable projection of the REAL
    * decode + histogram (rows-only check; ScalaTest pins goldens). */
  def features(documents: DataFrame): DataFrame =
    extractFeatures(attachImages(documents)).toDF()
      .select(col("media_id"), col("format"), col("byte_len"),
        col("width"), col("height"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), 32).cast("double"), 6).as("f31"))
      .orderBy("media_id")

  /** Output row of the resize stage: `checksum` is over the RESAMPLED
    * PIXELS (encoder-independent — stable even if a different PNG writer
    * produces different bytes); `byte_len` is the re-encoded PNG size. */
  final case class ResizedMedia(
      media_id: Long,
      width: Int,
      height: Int,
      byte_len: Int,
      checksum: Long)

  /** Resize stage: REAL decode → box-filter area-average downsample to
    * the target dims (integer arithmetic over the decoded raster — fully
    * deterministic, unlike Graphics2D interpolation which is
    * implementation-defined) → re-encode as PNG. Same partition-batched
    * typed form as [[extractFeatures]]. */
  def resize(media: DataFrame, targetW: Int = 16, targetH: Int = 16): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.map { case (id, payload) =>
          val (sw, sh, rgbs) = codec.decodeRgb(payload)
          val out = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
          var sum = 0L
          var ty = 0
          while (ty < targetH) {
            val y0 = ty * sh / targetH
            val y1 = math.max(y0 + 1, (ty + 1) * sh / targetH)
            var tx = 0
            while (tx < targetW) {
              val x0 = tx * sw / targetW
              val x1 = math.max(x0 + 1, (tx + 1) * sw / targetW)
              var r = 0L; var g = 0L; var b = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = rgbs(y * sw + x)
                  r += (rgb >> 16) & 0xff; g += (rgb >> 8) & 0xff; b += rgb & 0xff
                  x += 1
                }
                y += 1
              }
              val area = (x1 - x0).toLong * (y1 - y0)
              val pr = (r / area).toInt; val pg = (g / area).toInt; val pb = (b / area).toInt
              out.setRGB(tx, ty, (pr << 16) | (pg << 8) | pb)
              sum = (((sum * 31 + pr) * 31 + pg) * 31 + pb) & 0xFFFFFFFFL
              tx += 1
            }
            ty += 1
          }
          ResizedMedia(id, targetW, targetH, codec.encode(out, "png").length, sum)
        }
      }
  }

  /** `multimodal_resize` query surface (ScalaTest pins goldens, asserts
    * determinism and target dims). */
  def resized(documents: DataFrame): DataFrame =
    resize(attachImages(documents)).toDF()
      .orderBy("media_id")

  /** 64-bit perceptual average-hash (aHash) over the REAL decoded
    * pixels: decode → 8×8 box-filter LUMINANCE downsample (the same
    * exact integer area-average as [[resize]], on Rec.601 luma
    * 299r+587g+114b) → threshold each cell strictly above the grid's
    * floor-mean → one bit per cell, row-major from bit 0. Pure integer
    * arithmetic over decoded pixels, so the fingerprint is
    * deterministic across runs and partitionings (encoder-independent
    * too: it never touches the compressed bytes).
    *
    * Map-only at decode speed, the phash table is 16 bytes/image —
    * the 10⁶× reduction that makes corpus-scale image dedup a
    * fingerprint problem instead of a pixel problem. */
  def phash(media: DataFrame): Dataset[(Long, Long)] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.map { case (id, payload) =>
          val (sw, sh, rgbs) = codec.decodeRgb(payload)
          val lum = new Array[Long](64)
          var ty = 0
          while (ty < 8) {
            val y0 = ty * sh / 8
            val y1 = math.max(y0 + 1, (ty + 1) * sh / 8)
            var tx = 0
            while (tx < 8) {
              val x0 = tx * sw / 8
              val x1 = math.max(x0 + 1, (tx + 1) * sw / 8)
              var l = 0L
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = rgbs(y * sw + x)
                  l += 299L * ((rgb >> 16) & 0xff) +
                    587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              lum(ty * 8 + tx) = l / ((x1 - x0).toLong * (y1 - y0) * 1000L)
              tx += 1
            }
            ty += 1
          }
          val mean = lum.sum / 64L
          var fp = 0L
          var i = 0
          while (i < 64) { if (lum(i) > mean) fp |= (1L << i); i += 1 }
          (id, fp)
        }
      }
  }

  /** `dedup_phash_images`: near-duplicate IMAGE pairs — [[phash]]
    * fingerprints through the banded-Hamming LSH detector
    * ([[DedupOps.hammingBandPairs]], the same core as text simhash
    * pairs), with the hot-bucket cap ON by default: real crawls are full
    * of template screenshots and page chrome whose phash buckets go
    * quadratic, and (unlike text simhash, whose shingle mixing spreads
    * buckets) smooth-image fingerprints concentrate — the cap drops
    * template mass before any pair materializes. No oracle (pixel
    * decode is not SQL-expressible); the spec plants a perturbed
    * near-copy and an inverted far image and checks found/not-found
    * plus run-to-run determinism.
    *
    * `bands = 8` (round-7 ADVICE fix; was 4): by pigeonhole, a pair
    * within Hamming distance d must share at least one of the 8 8-bit
    * band slices whenever d < 8 — so every pair inside the default
    * `maxHamming = 6` is found DETERMINISTICALLY, not probabilistically
    * (with 4 bands only d < 4 was guaranteed; a distance-4..6 pair
    * could spread its differing bits across all four 16-bit slices and
    * be missed). The spec plants a distance-5 pair to pin the
    * guarantee. Cost: 2× band rows per image — still (band-key, id)
    * longs, negligible next to the decode. */
  def phashPairs(documents: DataFrame, bands: Int = 8, maxHamming: Int = 6,
                 maxBucket: Int = 64): DataFrame =
    DedupOps.hammingBandPairs(
      phash(attachImages(documents)).toDF("id", "fp"),
      bands, maxHamming, maxBucket)

  /** Minimal but REAL RIFF/AVI MJPEG writer: the standard container
    * layout — RIFF('AVI ') → LIST('hdrl') with `avih` + one
    * LIST('strl') ('vids'/'MJPG' `strh` + BITMAPINFOHEADER `strf`) →
    * LIST('movi') with one '00dc' chunk per JPEG frame (word-aligned,
    * per the spec) → 'idx1'. Everything little-endian. ffmpeg/VLC-class
    * readers accept this layout; [[parseAviMjpegFrames]] is the
    * matching in-repo parser and MultimodalSpec asserts the structural
    * invariants (magic, header sizes, index entries). */
  private def writeAviMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int,
                            fps: Int = 10): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fcc(listType) ++ body)
    require(frames.nonEmpty,
      "writeAviMjpeg needs at least one frame (nFrames >= 1): an AVI " +
        "with an empty movi list has no defined dwSuggestedBufferSize")
    val maxFrame = frames.map(_.length).max
    val avih = le32(1000000 / fps) ++ le32(maxFrame * fps) ++ le32(0) ++
      le32(0x10 /* AVIF_HASINDEX */) ++ le32(frames.length) ++ le32(0) ++
      le32(1) ++ le32(maxFrame) ++ le32(w) ++ le32(h) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(maxFrame) ++ le32(0xffffffff) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      fcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val moviChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", moviChunks.flatten.toArray)
    // idx1 offsets are relative to the start of the 'movi' list TYPE
    // fourcc (the common convention readers handle)
    val offsets = moviChunks.scanLeft(4)((acc, c) => acc + c.length).init
    val idx1 = chunk("idx1",
      offsets.zip(frames).flatMap { case (off, f) =>
        fcc("00dc") ++ le32(0x10 /* AVIIF_KEYFRAME */) ++
          le32(off) ++ le32(f.length)
      }.toArray)
    val riffBody = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(riffBody.length) ++ riffBody
  }

  /** Walk a RIFF/AVI payload and return its '00dc' (compressed video)
    * frame payloads — a real container parse (chunk headers, LIST
    * descent, word-aligned skips), not a trusted length prefix. */
  private def parseAviMjpegFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    def le32(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def fcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
    require(fcc(0) == "RIFF" && fcc(8) == "AVI ",
      s"not a RIFF/AVI payload: ${fcc(0)}/${fcc(8)}")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = fcc(o)
        val sz = le32(o + 4)
        if (id == "LIST") {
          val listType = fcc(o + 8)
          if (listType == "movi" || listType == "hdrl" || listType == "strl")
            walk(o + 12, o + 8 + sz)
        } else if (id == "00dc" && sz > 0) {
          frames += java.util.Arrays.copyOfRange(payload, o + 8, o + 8 + sz)
        }
        o += 8 + sz + (sz % 2) // chunks are word-aligned
      }
    }
    walk(12, 8 + le32(4))
    frames.toSeq
  }

  /** Ingestion stand-in with REAL video payloads: every row carries a
    * genuine RIFF/AVI MJPEG file — real container structure
    * ([[writeAviMjpeg]]) around real JDK-encoded JPEG frames — closing
    * the video half of the "real media codecs" deferral (ROADMAP #4;
    * the pre-r10 stand-in was a bespoke length-prefixed stream). Frame
    * CONTENT is synthesized deterministically ([[synthImage]]); the
    * container and the per-frame codec are the real formats. */
  def attachVideos(documents: DataFrame, nFrames: Int = 6,
                   frameW: Int = 20, frameH: Int = 14): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.map { id =>
          val frames = (0 until nFrames).map(f =>
            codec.encode(synthImage(id * 1009 + f, frameW, frameH), "jpeg"))
          MediaRow(id, writeAviMjpeg(frames, frameW, frameH),
            MediaMeta("avi-mjpg", frameW, frameH))
        }
      }.toDF()
  }

  /** Per-sampled-frame output: real decoded dims + CRC32 over the decoded
    * RGB pixel stream (encoder-independent). */
  final case class SampledFrame(
      media_id: Long,
      frame_idx: Int,
      frame_len: Int,
      width: Int,
      height: Int,
      pixel_crc: Long)

  /** Frame sampling over the REAL AVI container: parse the RIFF chunk
    * tree to the '00dc' frame boundaries (cheap — header walks, no
    * decode), DECODE only every `stride`-th JPEG frame, emit real dims
    * + a pixel CRC. One output row per sampled frame; payload bytes
    * never shuffle (the explode happens after projection to fixed-size
    * rows). */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = new ImageCodec
        it.flatMap { case (id, payload) =>
          parseAviMjpegFrames(payload).zipWithIndex.collect {
            case (frame, idx) if idx % stride == 0 =>
              val (w, h, rgbs) = codec.decodeRgb(frame)
              val crc = new java.util.zip.CRC32()
              var i = 0
              val n = w * h
              while (i < n) {
                val rgb = rgbs(i)
                crc.update((rgb >> 16) & 0xff)
                crc.update((rgb >> 8) & 0xff)
                crc.update(rgb & 0xff)
                i += 1
              }
              SampledFrame(id, idx, frame.length, w, h, crc.getValue)
          }
        }
      }.toDF()
  }

  /** `multimodal_frames` query surface (ScalaTest pins goldens). */
  def frames(documents: DataFrame): DataFrame =
    sampleFrames(attachVideos(documents))
      .orderBy("media_id", "frame_idx")

  /** Typed per-clip audio analysis row ([[audioStats]]); every stat is
    * an exact integer over decoded 16-bit samples. */
  final case class AudioStats(
      media_id: Long,
      sample_rate: Int,
      bits: Int,
      n_samples: Long,
      peak: Int,
      energy: Long,
      zero_crossings: Long)

  /** WAVE codec SPI providers, resolved ONCE per JVM (lazily, so each
    * executor initializes its own). `AudioSystem.write` and
    * `AudioSystem.getAudioInputStream` funnel EVERY call through
    * `JDK13Services.getProviders` — a SYNCHRONIZED static that re-runs
    * the full ServiceLoader scan each time (no cache on the providers
    * path in JDK 17). At two lookups per row (encode + decode) × 32
    * task threads, the global lock serialized the whole stage: jstack
    * sampling of the sf10 solo run put the majority of on-CPU frames
    * inside `getProviders` (134.8 s solo). Calling the SAME provider
    * objects directly — the real codec classes the JDK itself
    * dispatches to — removes the lock and the rescan; the r14 sf10
    * solo after this fix is the BENCH_NOTES "audio decoder reuse"
    * entry. */
  private lazy val wavWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toSeq
  }
  private lazy val wavReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }

  /** `AudioSystem.write(..., WAVE, out)` without the per-call provider
    * scan: first cached writer supporting WAVE for this stream. */
  private def writeWave(ais: javax.sound.sampled.AudioInputStream,
                        out: java.io.OutputStream): Unit = {
    val t = javax.sound.sampled.AudioFileFormat.Type.WAVE
    wavWriters.find(_.isFileTypeSupported(t, ais)) match {
      case Some(w) => w.write(ais, t, out); ()
      case None => // no SPI visible (exotic runtime): the slow, safe path
        javax.sound.sampled.AudioSystem.write(ais, t, out); ()
    }
  }

  /** The reader that last succeeded, tried FIRST on the next payload:
    * probing readers in ServiceLoader order re-enters the synchronized
    * provider scan through the back door — `SoftMidiAudioFileReader`
    * (listed before the WAVE reader) probes via `MidiSystem
    * .getSequence`, which calls the SAME `JDK13Services.getProviders`
    * per attempt (second jstack pass: ~95 of ~96 decode frames inside
    * the MIDI probe). A homogeneous payload column hits the hint every
    * row; a mixed column pays one mis-probe per format CHANGE, not per
    * row. */
  @volatile private var lastGoodReader
      : javax.sound.sampled.spi.AudioFileReader = null

  /** `AudioSystem.getAudioInputStream` without the per-call provider
    * scan; a fresh ByteArrayInputStream per attempt replaces the
    * mark/reset dance (wrapping the array allocates nothing big). */
  private def readAudio(payload: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val hint = lastGoodReader
    if (hint != null) {
      try return hint.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
    }
    wavReaders.foreach { r =>
      if (r ne hint) {
        try {
          val ais = r.getAudioInputStream(new ByteArrayInputStream(payload))
          lastGoodReader = r
          return ais
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
        }
      }
    }
    // no SPI matched/visible: the slow, safe path (throws the same
    // UnsupportedAudioFileException on genuinely bad bytes)
    javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
  }

  /** Deterministic 16-bit PCM waveform for clip `id` — integer
    * arithmetic only, so any executor regenerates identical samples
    * (the audio analog of [[synthImage]]). */
  private def synthSamples(id: Long, n: Int): Array[Short] = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((id * 31 + i.toLong * 7) % 2003L - 1001L) * 16L).toShort
      i += 1
    }
    out
  }

  /** Ingestion stand-in with REAL audio payloads: every row carries a
    * genuine RIFF/WAVE file (16-bit PCM mono, 8 kHz) written by the JDK
    * `javax.sound.sampled` encoder — the audio half of the "real media
    * codecs" deferral (ROADMAP #4; images got ImageIO in round 5). The
    * WAVEFORM is synthesized deterministically (no audio corpus in the
    * sandbox) but the container bytes are a real encoder's output and
    * the downstream stage parses them with the real decoder. */
  def attachAudioWav(documents: DataFrame, sampleRate: Int = 8000): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"))
      .as[Long]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(
          sampleRate.toFloat, 16, 1, true, false) // signed, little-endian
        it.map { id =>
          val n = 800 + (id % 800).toInt
          val samples = synthSamples(id, n)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            pcm(2 * i) = (samples(i) & 0xff).toByte
            pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, n.toLong)
          val baos = new ByteArrayOutputStream(pcm.length + 64)
          writeWave(ais, baos)
          MediaRow(id, baos.toByteArray, MediaMeta("wav", sampleRate, 16))
        }
      }.toDF()
  }

  /** Audio feature extraction over WAV payloads: REAL
    * `javax.sound.sampled` parse (container header read by the JDK
    * decoder, not trusted metadata) + exact-integer clip statistics —
    * sample count, peak amplitude, energy (Σ s², the loudness measure),
    * and zero-crossing count (the classic cheap voiced/unvoiced &
    * noisiness proxy). Partition-batched typed `mapPartitions`, the
    * image-tier batching contract; payload bytes never shuffle. */
  def audioStats(media: DataFrame): Dataset[AudioStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val ais = readAudio(payload)
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"unsupported WAV shape: $fmt")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var i = 0
          var peak = 0
          var energy = 0L
          var zc = 0L
          var prev = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            val s = (hi << 8) | lo
            if (math.abs(s) > peak) peak = math.abs(s)
            energy += s.toLong * s.toLong
            if (i > 0 && ((s < 0 && prev >= 0) || (s >= 0 && prev < 0))) zc += 1
            prev = s
            i += 1
          }
          AudioStats(id, fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
            n.toLong, peak, energy, zc)
        }
      }
  }

  /** `multimodal_audio_wav` query surface: real-WAV ingest + decode
    * stats. No oracle (codec payload bytes are not SQL-expressible —
    * the image-tier rule); MultimodalSpec recomputes every stat from
    * the waveform formula and asserts the decoded values match. */
  def audioWav(documents: DataFrame): DataFrame =
    audioStats(attachAudioWav(documents)).toDF().orderBy("media_id")
}
