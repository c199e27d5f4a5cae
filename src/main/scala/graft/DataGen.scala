package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic data generator mirroring TESTDATA.md's schemas,
  * cardinality ratios, value ranges, and skew at ARBITRARY scale factors —
  * for the sf ≥ 1 scale shakeouts (docs/SCALE.md) that the driver-provided
  * sf ≤ 0.1 directories can't cover. The driver's testdata is read-only
  * and its generator is not available, so absolute VALUES differ; every
  * property the queries depend on is preserved:
  *
  *  - identical column names/types per table (events.ts is written as raw
  *    LONG nanoseconds, matching the TIMESTAMP(NANOS)-as-long contract
  *    `Tables.events` expects);
  *  - region/nation contents byte-identical (query literals like
  *    `r_name = 'ASIA'`, `c_mktsegment = 'BUILDING'` must keep hitting);
  *  - documents carry planted exact (~1%), normalized (~1%), and
  *    near-duplicate (~1%) texts so the dedup family does real work;
  *  - embeddings are 10 labeled Gaussian clusters so KMeans/ANN recall is
  *    meaningful;
  *  - events.user_id follows a power-law (hot users) so skew paths are
  *    exercised.
  *
  * Determinism: every value is a pure function of (row id, column seed)
  * via xxhash64 column expressions (relational tables — generation runs
  * at scan speed, no driver-side loops) or a per-id seeded JDK Random
  * (documents/embeddings via mapPartitions, where duplicate planting
  * needs to regenerate ANOTHER row's text). Same (sf, out) → same bytes.
  *
  * Usage: `runMain graft.DataGen <sf> <outDir> [tables]` (e.g.
  * `1 /root/repo/localdata/sf1`, or `10 /root/repo/localdata/sf10
  * documents,embeddings` to build only the corpus tables for the
  * dedup-family shakeout).
  */
object DataGen {

  private def h(seed: Int, cs: Column*): Column =
    abs(xxhash64(cs :+ lit(seed): _*))

  private def u(seed: Int, cs: Column*): Column =
    (h(seed, cs: _*) % 1000000L) / lit(1000000.0)

  private val vocab = Vector(
    "spark", "batch", "stream", "column", "line", "order", "part", "query",
    "table", "hash", "scan", "sort", "filter", "group", "join", "agg",
    "value", "key", "fast", "slow", "small", "large", "vector", "index",
    "cache", "shuffle", "merge", "window", "range", "count", "customer",
    "supplier", "dedup", "token", "text", "corpus", "sample", "cluster",
    "embed", "media")

  /** One Zipf-ish token: head ranks map to the 40 theme words, the tail
    * to synthetic rare words. The u³ transform concentrates mass at low
    * ranks (frequent head) with a long rare tail — the df distribution
    * real shingling sees. A FIXED small vocabulary does not survive
    * scale-up: at 500k docs every 3-shingle lands in hundreds of
    * documents and any exact pair-generation dedup (Σ df² candidate
    * pairs) explodes combinatorially — found empirically by the sf10
    * shakeout; the driver's own sf ≤ 0.1 corpus has only 31 distinct
    * words, which is harmless at 5k docs and catastrophic at 500k. */
  private def wordFor(rnd: java.util.Random, vocabSize: Int): String = {
    val u = rnd.nextDouble()
    val r = math.min(vocabSize - 1, (u * u * u * vocabSize).toInt)
    if (r < vocab.size) vocab(r) else "w" + r
  }

  /** Canonical text of a document id — regenerable from any row, which is
    * how duplicate planting references another document without a join. */
  private def textOf(id: Long, vocabSize: Int): String = {
    val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 7L)
    val n = 8 + rnd.nextInt(92)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(wordFor(rnd, vocabSize))
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val (sfStr, outDir) = (args(0), args(1))
    val tables: Set[String] =
      if (args.length > 2) args(2).split(',').map(_.trim).toSet else Set.empty
    def wanted(name: String): Boolean = tables.isEmpty || tables(name)
    val sf = sfStr.toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nCust = math.max(10, (150000 * sf).toInt)
    val nOrders = math.max(100, (1500000 * sf).toInt)
    val nPart = math.max(20, (200000 * sf).toInt)
    val nSupp = math.max(5, (10000 * sf).toInt)
    val nEvents = math.max(100, (1000000 * sf).toLong)
    val nUsers = math.max(100, (15000 * sf).toInt)
    val nDocs = math.max(50, (50000 * sf).toInt)
    val nVecs = math.max(50, (20000 * sf).toInt)

    def out(name: String) = s"$outDir/$name.parquet"
    def save(df: => org.apache.spark.sql.DataFrame, name: String): Unit =
      if (wanted(name)) {
        df.write.mode("overwrite").parquet(out(name))
        println(s"[datagen] wrote $name")
      }

    // region / nation: byte-identical to the driver tables (query literals)
    save(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
        (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
      .select(col("r_regionkey").cast("int"), col("r_name")), "region")
    save((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int")), "nation")

    val segs = typedlit(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY"))
    save(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      (h(1, col("id")) % 25).cast("int").as("c_nationkey"),
      round(u(2, col("id")) * 10999 - 999, 2).as("c_acctbal"),
      element_at(segs, (h(3, col("id")) % 5 + 1).cast("int")).as("c_mktsegment")),
      "customer")

    save(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      (h(4, col("id")) % 25).cast("int").as("s_nationkey"),
      round(u(5, col("id")) * 10999 - 999, 2).as("s_acctbal")), "supplier")

    val brands = typedlit(Seq("Brand#11", "Brand#22", "Brand#33", "Brand#44",
      "Brand#55"))
    val types = typedlit(Seq("ECONOMY ANODIZED STEEL", "STANDARD POLISHED TIN",
      "PROMO BURNISHED COPPER", "MEDIUM PLATED BRASS", "SMALL BRUSHED NICKEL"))
    save(spark.range(nPart).select(
      col("id").as("p_partkey"),
      format_string("part %d of many", col("id")).as("p_name"),
      element_at(brands, (h(6, col("id")) % 5 + 1).cast("int")).as("p_brand"),
      element_at(types, (h(7, col("id")) % 5 + 1).cast("int")).as("p_type"),
      (h(8, col("id")) % 50 + 1).cast("int").as("p_size"),
      round(u(9, col("id")) * 1100 + 900, 2).as("p_retailprice")), "part")

    val statuses = typedlit(Seq("O", "P", "F"))
    val prios = typedlit(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW"))
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      (h(10, col("id")) % nCust).as("o_custkey"),
      element_at(statuses, (h(11, col("id")) % 3 + 1).cast("int")).as("o_orderstatus"),
      round(u(12, col("id")) * 104099 + 900, 2).as("o_totalprice"),
      to_timestamp(date_add(lit("1995-01-01").cast("date"),
        (h(13, col("id")) % 2404).cast("int"))).as("o_orderdate"),
      element_at(prios, (h(14, col("id")) % 5 + 1).cast("int")).as("o_orderpriority"))
    save(orders, "orders")

    // lineitem: 1–8 lines per order (mean ≈ 4.1, matching the driver's
    // 4.075 lines/order); shipdate = orderdate + 1..120 days
    val flags = typedlit(Seq("A", "N", "R"))
    val lstat = typedlit(Seq("O", "F"))
    val li = orders.select(col("o_orderkey"), col("o_orderdate"))
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(1),
          (h(20, col("o_orderkey")) % 8 + 1).cast("int"))).as("l_linenumber"))
    def lh(seed: Int) = h(seed, li("o_orderkey"), li("l_linenumber"))
    def lu(seed: Int) = u(seed, li("o_orderkey"), li("l_linenumber"))
    save(li.select(
      col("o_orderkey").as("l_orderkey"),
      (lh(21) % nPart).as("l_partkey"),
      (lh(22) % nSupp).as("l_suppkey"),
      col("l_linenumber"),
      (lh(23) % 50 + 1).cast("double").as("l_quantity"),
      round(lu(24) * 104099 + 900, 2).as("l_extendedprice"),
      ((lh(25) % 11) / lit(100.0)).as("l_discount"),
      ((lh(26) % 9) / lit(100.0)).as("l_tax"),
      element_at(flags, (lh(27) % 3 + 1).cast("int")).as("l_returnflag"),
      element_at(lstat, (lh(28) % 2 + 1).cast("int")).as("l_linestatus"),
      to_timestamp(date_add(col("o_orderdate").cast("date"),
        (lh(29) % 120 + 1).cast("int"))).as("l_shipdate")), "lineitem")

    // events: µs TimestampType over 30 days of 2024-01 (Tables.events
    // passes a TimestampType through; DuckDB reads it natively, so the
    // time-bucket oracles bind); user_id power-law for skew.
    // SPARK_GRAFT_EVENTS_TS=ntz writes ts as TIMESTAMP_NTZ instead —
    // the type the driver's round-7 fixture regeneration shipped — so
    // the suite can be exercised against BOTH flavors (r7 verdict #4);
    // under this builder's pinned-UTC session the LTZ→NTZ cast keeps
    // the micros bit-identical (NTZ-as-UTC, Tables.events convention).
    val etypes = typedlit(Seq("click", "view", "purchase", "signup", "error"))
    val epoch2024us = 1704067200L * 1000000L
    val tsFlavor = sys.env.getOrElse("SPARK_GRAFT_EVENTS_TS", "ltz")
    val tsBase = timestamp_micros(lit(epoch2024us) +
      h(30, col("id")) % (30L * 86400 * 1000000L))
    save(spark.range(nEvents).select(
      col("id").as("event_id"),
      (if (tsFlavor == "ntz")
        tsBase.cast(org.apache.spark.sql.types.TimestampNTZType)
      else tsBase).as("ts"),
      floor(pow(u(31, col("id")), 1.5) * nUsers).cast("long").as("user_id"),
      element_at(etypes, (h(32, col("id")) % 5 + 1).cast("int")).as("event_type"),
      round(u(33, col("id")) * 200, 2).as("value"),
      format_string("{\"k\": %d}", h(34, col("id")) % 100).as("props")), "events")

    // documents: planted exact / normalized / near duplicates (~1% each);
    // mapPartitions so a duplicate can REGENERATE its source row's text.
    // Vocabulary scales with the corpus (Zipf head+tail, see wordFor) so
    // shingle document-frequencies stay scale-realistic.
    val langs = Vector("en", "en", "en", "en", "de", "zh", "fr", "es")
    val vocabSize = math.max(vocab.size, nDocs / 5)
    save(spark.range(nDocs).as[Long].mapPartitions { it =>
      it.map { id =>
        val text =
          if (id % 101 == 100 && id >= 50) textOf(id - 50, vocabSize)
          else if (id % 97 == 96 && id >= 30)
            "  " + textOf(id - 30, vocabSize).toUpperCase + "  "
          else if (id % 89 == 88 && id >= 20) {
            val t = textOf(id - 20, vocabSize).split(' ')
            t(t.length / 2) = "changed"
            t.mkString(" ")
          } else textOf(id, vocabSize)
        val rnd = new java.util.Random(id * 2654435761L + 13L)
        (id, text, langs(rnd.nextInt(langs.size)), s"src${id % 20}",
          text.length.toLong)
      }
    }.toDF("doc_id", "text", "lang", "source", "n_chars"), "documents")

    // embeddings: 10 loose Gaussian clusters in 64-d (labels = ground
    // truth for KMeans/IVF) with ~1% PLANTED near-duplicate pairs. Noise
    // 0.8 keeps within-cluster cosine ≈ 0.45 — mild locality, no
    // accidental near-dups (the driver corpus has none either: max pair
    // cosine 0.479) — because near-dup detection presumes dup pairs are
    // RARE; a tight-cluster corpus makes every pair a candidate and any
    // LSH bucketing degenerates (sf10 shakeout finding).
    def vecOf(id: Long): Array[Float] = {
      val label = (id % 10).toInt
      val rnd = new java.util.Random(id * 6364136223846793005L + 17L)
      Array.tabulate(64) { d =>
        (math.sin(label * 37.0 + d) + rnd.nextGaussian() * 0.8).toFloat
      }
    }
    save(spark.range(nVecs).as[Long].mapPartitions { it =>
      it.map { id =>
        val emb =
          if (id % 97 == 96 && id >= 30) {
            // near-dup of vec (id-30): tiny perturbation, cosine ≈ 0.999
            val rnd = new java.util.Random(id * 31L + 23L)
            vecOf(id - 30).map(v => v + rnd.nextGaussian().toFloat * 0.05f)
          } else vecOf(id)
        (id, emb, (id % 10).toInt)
      }
    }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding"), col("label").cast("int")),
      "embeddings")

    println(s"[datagen] done: sf=$sf at $outDir")
    spark.stop()
  }
}
