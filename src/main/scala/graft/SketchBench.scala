package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the Space-Saving sketch against the exact groupBy on the
  * regime the sketch exists for: heavy hitters over a key whose
  * CARDINALITY is the bottleneck (r8 verdict #4's "that measurement
  * doesn't exist yet"). Keys, cheapest to widest:
  *   word      — `text_wordcount`'s key (small vocabulary; exact wins
  *               here and should),
  *   bigram    — adjacent word pairs (~quadratic vocabulary growth),
  *   trigram   — ~cubic; at sf1 this is millions of distinct keys.
  * The exact form shuffles one row per DISTINCT key; the sketch
  * shuffles `capacity` counters per partition, period — the crossover
  * is where the distinct-key shuffle outgrows the constant-width one.
  *
  * Writes docs/SKETCH_BENCH.json (or SKETCH_BENCH_<tag>.json via
  * SPARK_GRAFT_BENCH_TAG) and prints the same JSON line.
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val capacity = sys.env.get("SPARK_GRAFT_SKETCH_CAP").map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.muteBoundedGlobalWindowWarn

    val docs = Tables.documents(spark, sfDir)

    def keyed(gram: Int): DataFrame = {
      val ws = filter(split(lower(col("text")), " "), w => w =!= "")
      val keys = gram match {
        case 1 => ws
        case n =>
          // adjacent n-grams via the same HOF the text family uses:
          // zip offsets and join with a space — map-side only
          filter(
            transform(ws, (_, i) =>
              when(i + lit(n - 1) < size(ws),
                concat_ws(" ", slice(ws, i + lit(1), lit(n)))))
            , g => g.isNotNull)
      }
      docs.select(explode(keys).as("k"))
    }

    def exactTopK(gram: Int): DataFrame =
      keyed(gram).groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("k")).limit(10)

    def sketchTopK(gram: Int): DataFrame =
      keyed(gram)
        .select(functions.SpaceSaving.heavyHitters(col("k"), capacity).as("hh"))
        .select(explode(slice(col("hh"), 1, 10)).as("h"))
        .select(col("h._1").as("k"), col("h._2").as("est"))

    def time(df: => DataFrame): Double = {
      df.count() // warm: JIT + codegen + footers
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val rows = Seq(1, 2, 3).map { g =>
      val card = keyed(g).select(approx_count_distinct(col("k"))).head().getLong(0)
      val te = time(exactTopK(g))
      val ts = time(sketchTopK(g))
      System.err.println(f"[sketch] gram=$g distinct~$card exact=$te%.2fs sketch=$ts%.2fs")
      (s"gram$g", card, te, ts)
    }

    // The synthetic corpus has a tiny vocabulary (~32 words), so even
    // trigrams stay far below the cardinality where the exact form's
    // one-shuffle-row-per-DISTINCT-key becomes the bottleneck — the
    // grams rows above measure the regime where exact WINS and should.
    // The sketch's target regime needs web-scale key cardinality
    // (billions of urls/domains/grams): model it with a deterministic
    // Zipf-ish stream — u^s quantile mapping over M possible keys, u
    // uniform from xxhash64(id) — sized relative to the corpus SF.
    val nDocs = docs.count()
    val zRows = sys.env.get("SPARK_GRAFT_SKETCH_ROWS").map(_.toLong)
      .getOrElse(math.max(2_000_000L, nDocs * 2000L))
    val zDistinct = zRows / 5
    def zipfKeys: DataFrame = spark.range(zRows).select(
      concat(lit("k"), floor(
        pow(abs(xxhash64(col("id"))).cast("double") / Long.MaxValue.toDouble, 4.0)
          * zDistinct).cast("long")).as("k"))
    def zipfExact: DataFrame =
      zipfKeys.groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("k")).limit(10)
    def zipfSketch: DataFrame =
      zipfKeys
        .select(functions.SpaceSaving.heavyHitters(col("k"), capacity).as("hh"))
        .select(explode(slice(col("hh"), 1, 10)).as("h"))
        .select(col("h._1").as("k"), col("h._2").as("est"))
    val zCard = zipfKeys.select(approx_count_distinct(col("k"))).head().getLong(0)
    val zte = time(zipfExact)
    val zts = time(zipfSketch)
    System.err.println(
      f"[sketch] zipf rows=$zRows distinct~$zCard exact=$zte%.2fs sketch=$zts%.2fs")

    val allRows = rows :+ (("zipf", zCard, zte, zts))
    val body = allRows.map { case (name, card, te, ts) =>
      f""""$name": {"distinct_approx": $card, "exact_sec": $te%.3f, "sketch_sec": $ts%.3f}"""
    }.mkString(", ")
    val json =
      s"""{"metric": "sketch_vs_exact", "capacity": $capacity, "sf": "$sfDir", "cpus": $cpus, $body}"""
    val tag = sys.env.get("SPARK_GRAFT_BENCH_TAG").map("_" + _).getOrElse("")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"docs/SKETCH_BENCH$tag.json"), json + "\n")
    println(json)
    spark.stop()
  }
}
