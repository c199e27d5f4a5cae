package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}

import graft.operators.DedupOps

/** Scratch probe main for the dedup family's 10×-data scaling ratios
  * (VERDICT r16 #6 — the SF100_PROBE device applied to the two
  * remaining corpus-sized dedup stages without a measured ratio): the
  * minhash signature+band build (shingle → minhash → banded keys, the
  * map-side stage every LSH query and the incremental maintainer pay
  * per corpus/delta) and the span-rewrite first-occurrence pipeline
  * (span synthesis + min-struct keeper aggregate + rewrite). Each stage
  * is FORCED (xxhash64 over every output column, bit_xor-folded — the
  * Bench forced-mode device, so Catalyst cannot prune the measured
  * work). Drive with `SPARK_GRAFT_SF_DIR=… runMain graft.DedupScaleProbe
  * [minhash|span|both]`; conf-off clones keep the pairs caches out of
  * the measurement. */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_GRAFT_AUTOSIZE").contains("1"))
      ScaleConf.confEntries(ScaleConf.derive(
        ScaleConf.inputBytes(sfDir), cpus.toInt,
        ScaleConf.executorMemoryBytes(s"local[$cpus]")))
        .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.dedup.pairsCache", "false")
    def docs = Tables.documents(spark, sfDir)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .selectExpr("bit_xor(h)").head()
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[dedupprobe] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  sf=$sfDir")
    }
    val which = args.headOption.getOrElse("both")
    if (which == "minhash" || which == "both") {
      // the map-side LSH build: shingle hash sets -> 32 minhash lanes ->
      // 8 banded keys/doc; no shuffle — the stage the signature store
      // sinks and every candidate join consumes
      time("minhash_sig_band_build") {
        force(DedupOps.minhashBanded(
          DedupOps.minhashSignatures(DedupOps.shingleSets(docs, 3), 32),
          32, 4))
      }
    }
    if (which == "span" || which == "both") {
      // span synthesis + the min-struct first-occurrence keeper
      // aggregate + the per-doc rewrite
      time("span_rewrite_full") { force(DedupOps.spanRewrite(docs)) }
    }
    if (which == "spanstages18") {
      // stage split of the r18 packed-long + re-synthesis plan
      import org.apache.spark.sql.functions.{bitwiseNOT => _, _}
      val spans = DedupOps.spanTable(docs, 5)
      val pk = spans.select(col("h"),
        (shiftleft(col("doc_id"), 22)
          .bitwiseOR(col("block_idx").cast("long"))).as("pk"))
      time("span_pk_synth_forced") { force(pk) }
      val keeper = pk.groupBy("h").agg(min(col("pk")).as("pk"))
      time("span_keeper_hashagg_forced") { force(keeper) }
      val keptIdx = keeper
        .select(shiftright(col("pk"), 22).as("doc_id"),
          col("pk").bitwiseAND(lit((1L << 22) - 1)).cast("int").as("block_idx"))
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("block_idx"))).as("kept"))
      time("span_keptidx_forced") { force(keptIdx.select(col("doc_id"), size(col("kept")).as("n"))) }
      time("span_rewrite_full_r18") { force(DedupOps.spanRewrite(docs)) }
    }
    if (which == "spanstages") {
      // stage split of the full pipeline: the map-only synthesis, the
      // keeper aggregate alone, and the h-keyed reattach join
      val spans = DedupOps.spanTable(docs, 5)
      time("span_synth_forced") { force(spans) }
      import org.apache.spark.sql.functions.{count => fcount, lit, min, struct}
      val firsts = spans
        .select(col("h"), col("doc_id"), col("block_idx"))
        .groupBy("h")
        .agg(min(struct(col("doc_id"), col("block_idx"))).as("first"))
      time("span_firsts_forced") { force(firsts) }
      val joined = spans.join(firsts, Seq("h"))
        .filter(col("first.doc_id") === col("doc_id") &&
          col("first.block_idx") === col("block_idx"))
      time("span_join_count") { joined.agg(fcount(lit(1))).head() }
    }
    spark.stop()
  }
}
