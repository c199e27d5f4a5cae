package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Corpus-preparation operators: semantics on planted fixtures plus
  * equivalence of the distributed formulations with their naive
  * single-task forms (the oracle gate checks them against DuckDB on the
  * real tables; these specs pin the behaviors the oracle can't isolate).
  */
class CorpusOpsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("decontaminate drops exactly the train docs sharing a trigram with eval") {
    // doc 0 is the eval set (0 % 50 == 0); doc 100 shares the trigram
    // "alpha beta gamma", doc 101 shares no trigram, doc 102 shares only
    // single words (not enough for a trigram overlap)
    val df = docs(
      0L -> "alpha beta gamma delta",
      100L -> "prefix words then alpha beta gamma here",
      101L -> "completely different content with no overlap at all",
      102L -> "alpha unrelated beta filler gamma spread")
    val kept = CorpusOps.decontaminate(df).collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(101L, 102L))
  }

  test("incrementalDedup drops exactly the new docs whose text exists in the snapshot") {
    // ids 0-6 land in the snapshot (id%10<7), 17/27 are the "new shard":
    // 17 repeats doc 3's text (dropped), 27 is novel (kept)
    val df = docs(
      0L -> "snapshot doc zero",
      3L -> "a duplicated body of text",
      17L -> "a duplicated body of text",
      27L -> "a genuinely new document")
    val kept = CorpusOps.incrementalDedup(df).collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(27L))
  }

  test("BatchPipeline: corpus prep is four named stages, one composed plan") {
    val df = Tables.documents(spark, sf())
    val pipe = CorpusOps.corpusPrepPipeline(df)
    assert(pipe.describe === Seq("quality_gate", "exact_dedup", "decontaminate", "pack_chunks"))
    // the staged run IS pipeline_corpus_full (same oracle-checked result)
    assert(pipe.run(df).collect().toSeq === CorpusOps.corpusFull(df).collect().toSeq)
    // andThen appends a stage that sees the composed output
    val counted = pipe.andThen("count_chunks",
      d => d.agg(count(lit(1)).as("n_chunks")))
    assert(counted.describe.last === "count_chunks")
    assert(counted.run(df).collect().head.getLong(0) ===
      CorpusOps.corpusFull(df).count())
  }

  test("packChunks equals the naive single-task window formulation") {
    val df = Tables.documents(spark, sf())
    val got = CorpusOps.packChunks(df, budget = 512).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("doc_id").rowsBetween(Long.MinValue, 0)
    val naive = df
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= "")).as("n"))
      .withColumn("cum", sum(col("n").cast("long")).over(w))
      .withColumn("chunk", expr("(cum - n) DIV 512"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("chunk_tokens"))
      .orderBy("chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === naive)
    // chunks are contiguous from 0 and only the straddling doc spills:
    // every chunk's token count is >= budget - max straddle and the ids
    // are 0..n-1
    assert(got.map(_._1) === got.indices.map(_.toLong))
  }

  test("sampleStratified is deterministic and respects per-stratum thresholds") {
    val df = Tables.documents(spark, sf())
    val a = CorpusOps.sampleStratified(df).collect().map(_.getLong(0)).toSeq
    val b = CorpusOps.sampleStratified(df).collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // en sampled at ~25%, non-en at ~50% — check the thresholds bind
    val kept = CorpusOps.sampleStratified(df)
    val keptEn = kept.filter(col("lang") === "en").count().toDouble
    val totalEn = df.filter(col("lang") === "en").count().toDouble
    val keptOther = kept.filter(col("lang") =!= "en").count().toDouble
    val totalOther = df.filter(col("lang") =!= "en").count().toDouble
    assert(math.abs(keptEn / totalEn - 0.25) < 0.1,
      s"en rate ${keptEn / totalEn}")
    assert(math.abs(keptOther / totalOther - 0.5) < 0.1,
      s"other rate ${keptOther / totalOther}")
  }

  test("lmScore: common bigrams score high, docs under two words drop out") {
    val df = docs(
      1L -> "the cat sat",        // bigrams: "the cat", "cat sat"
      2L -> "the cat ran",        // bigrams: "the cat", "cat ran"
      3L -> "one")                // no bigram -> absent
    val out = CorpusOps.lmScore(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(3L))
    // "the cat" occurs twice in the corpus; the others once
    assert(out(1L) === ((2L, 3L))) // 2 bigrams, freq 2 + 1
    assert(out(2L) === ((2L, 3L)))
  }

  test("repetition: repeated trigrams raise dup_ratio; unique docs score 0") {
    val rep = "spam spam spam spam spam"       // 3 trigrams, all identical
    val uniq = "one two three four five"       // 3 trigrams, all distinct
    val out = CorpusOps.repetition(docs(1L -> rep, 2L -> uniq, 3L -> "too short"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) === ((3, 1, 1.0 - 1.0 / 3)))
    assert(out(2L) === ((3, 3, 0.0)))
    assert(!out.contains(3L)) // 2 words -> no trigram -> excluded
  }

  test("sampleMixture keeps tiers at ~75/50/25 percent") {
    val df = Tables.documents(spark, sf())
    val kept = CorpusOps.sampleMixture(df).withColumnRenamed("source", "src")
    val rates = df.select(col("doc_id"), col("source"))
      .join(kept, Seq("doc_id"), "left")
      .groupBy("source")
      .agg((count(col("src")).cast("double") / count(lit(1))).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def tierRate(srcs: Seq[String]): Double =
      srcs.map(rates).sum / srcs.size
    // 25 docs/source at sf0.01 — tolerate sampling noise per tier
    assert(math.abs(tierRate((0 to 4).map("src" + _)) - 0.75) < 0.15)
    assert(math.abs(tierRate((5 to 9).map("src" + _)) - 0.5) < 0.15)
    assert(math.abs(tierRate((10 to 19).map("src" + _)) - 0.25) < 0.15)
  }

  test("qualityQuantileFilter keeps strictly-above-median docs") {
    val df = Tables.documents(spark, sf())
    val kept = CorpusOps.qualityQuantileFilter(df)
    val n = df.count()
    val k = kept.count()
    assert(k > 0 && k < n)
    // strictly-above-median keeps at most half
    assert(k <= n / 2 + 1, s"kept $k of $n")
    // and the minimum kept word count exceeds the median
    val med = df
      .select(size(filter(split(col("text"), " "), t => t =!= "")).as("n_words"))
      .agg(percentile(col("n_words"), lit(0.5))).collect()(0).getDouble(0)
    val minKept = kept.agg(min("n_words")).collect()(0).getInt(0)
    assert(minKept > med)
  }

  test("corpusFull composition is consistent with its independent stages") {
    val df = Tables.documents(spark, sf())
    val chunks = CorpusOps.corpusFull(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.nonEmpty)
    // chunk ids are contiguous from 0 (no gaps: packing is dense)
    assert(chunks.map(_._1).toSeq === chunks.indices.map(_.toLong))
    // independently recompute the survivor set: quality gate + exact
    // dedup (via the verified operators) minus eval + contaminated
    val minWords = size(filter(split(col("text"), " "), t => t =!= ""))
    val kept = DedupOps.exact(df.filter(minWords >= 20))
      .select("doc_id")
    val evalOrContaminated = CorpusOps.decontaminate(df)  // survivors of decon on RAW corpus
    // corpusFull's survivors = kept ∩ decontaminate(df)'s survivors
    // (decontaminate uses raw-corpus eval grams, same as corpusFull)
    val survivors = kept.join(evalOrContaminated.select("doc_id"), Seq("doc_id"), "left_semi")
      .join(df, Seq("doc_id"))
      .select(col("doc_id"), minWords.cast("long").as("n"))
    val (nDocs, nTokens) = survivors.agg(count(lit(1)), sum("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
    assert(chunks.map(_._2).sum === nDocs)
    assert(chunks.map(_._3).sum === nTokens)
  }

  test("skewSalted join result is identical to the plain join") {
    val li = Tables.lineitem(spark, sf())
    val o = Tables.orders(spark, sf())
    val salted = Joins.skewSalted(li, o).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("o_orderstatus").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted === plain)
  }
}
