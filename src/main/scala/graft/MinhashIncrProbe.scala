package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.operators.DedupOps

/** Probe main for the minhash incremental fold's per-append cost with
  * and without the SUNK banded-key table (r18, VERDICT r17 #3): the
  * pre-r18 fold re-derived `minhashBanded(store)` from the signature
  * store on EVERY append — a per-append recompute that grows with the
  * corpus; the r18 state sinks `(doc_id, bk)` once per document and
  * every later fold's store side scans it. This probe isolates exactly
  * that term: per append level L it times `deltaMinhashPairs(store_L,
  * delta_L)` legacy (storeBands = None → re-band) vs sunk (storeBands =
  * the levels' banded parquet), against identical on-disk store/delta
  * parquet — the maintainer's state layout minus the bus machinery.
  * Each (level, mode) runs twice and keeps the min; modes alternate so
  * page-cache warmth cannot favor one side. Drive with
  * `SPARK_GRAFT_SF_DIR=… runMain graft.MinhashIncrProbe`; set
  * `SPARK_GRAFT_OUT=docs/MINHASH_INCR_R18.json` to persist the stamp
  * and `SPARK_GRAFT_NBATCHES` (default 8) for the fold width. */
object MinhashIncrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_NBATCHES", "8").toInt
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
    val docs = Tables.documents(spark, sfDir)

    // sink each append slice's enriched rows and banded keys ONCE —
    // the state layout the maintainer commits per version, flattened
    val base = Files.createTempDirectory("mm-incr-probe-").toString
    val sliceDirs = (0 until nBatches).map { b =>
      val enr = DedupOps.minhashEnriched(
        docs.filter(pmod(col("doc_id"), lit(nBatches)) === b))
      val d = s"$base/enr$b"
      enr.write.parquet(d)
      DedupOps.minhashBanded(spark.read.parquet(d), 32, 4)
        .write.parquet(s"$base/bands$b")
      d
    }
    def storeUnion(level: Int): DataFrame =
      spark.read.parquet((0 until level).map(b => s"$base/enr$b"): _*)
    def bandsUnion(level: Int): DataFrame =
      spark.read.parquet((0 until level).map(b => s"$base/bands$b"): _*)

    def fold(level: Int, sunk: Boolean): Double = {
      val t0 = System.nanoTime()
      DedupOps.deltaMinhashPairs(
        Some(storeUnion(level)), spark.read.parquet(s"$base/enr$level"),
        storeBands = if (sunk) Some(bandsUnion(level)) else None).count()
      (System.nanoTime() - t0) / 1e9
    }
    val levels = (1 until nBatches).map { level =>
      // alternate modes, two reps each, keep min — equal warmth
      val l1 = fold(level, sunk = false); val s1 = fold(level, sunk = true)
      val l2 = fold(level, sunk = false); val s2 = fold(level, sunk = true)
      val (lg, sk) = (math.min(l1, l2), math.min(s1, s2))
      Console.err.println(
        f"[mm-incr-probe] level $level: legacy $lg%.2f s, sunk $sk%.2f s")
      (level, lg, sk)
    }
    val totalLegacy = levels.map(_._2).sum
    val totalSunk = levels.map(_._3).sum

    // r19 (VERDICT r18 Next #7): decompose ONE deep fold's wall into
    // its stages — delta enrich (the map pass the maintainer pays on
    // raw documents), delta banding, the store-side candidate band
    // join, and the Jaccard verify — so "sunk bands bought only 8.3%"
    // has an answer: whichever term dominates is the design's honest
    // residual. Each stage min-of-2; the verify term is full − cand
    // over the same sunk inputs (shared band work cancels).
    val deep = nBatches - 1
    def t2(f: => Long): Double = {
      def once = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      math.min(once, once)
    }
    val rawSlice = docs.filter(pmod(col("doc_id"), lit(nBatches)) === deep)
    val enrichSec = t2(DedupOps.minhashEnriched(rawSlice).count())
    val deltaEnr = spark.read.parquet(s"$base/enr$deep")
    val bandSec = t2(DedupOps.minhashBanded(deltaEnr, 32, 4).count())
    val candSec = t2 {
      import org.apache.spark.sql.functions.{greatest, least}
      val bandedDelta = DedupOps.minhashBanded(deltaEnr, 32, 4)
      val bandedAll = bandsUnion(deep).unionAll(bandedDelta)
      bandedDelta.select(col("bk"), col("doc_id").as("id_x"))
        .join(bandedAll.select(col("bk"), col("doc_id").as("id_y")), Seq("bk"))
        .filter(col("id_x") =!= col("id_y"))
        .select(least(col("id_x"), col("id_y")).as("id_a"),
          greatest(col("id_x"), col("id_y")).as("id_b"))
        .distinct().count()
    }
    val fullSec = t2(DedupOps.deltaMinhashPairs(
      Some(storeUnion(deep)), deltaEnr,
      storeBands = Some(bandsUnion(deep))).count())
    val verifySec = math.max(0.0, fullSec - candSec)
    // the r19 maintainer path: delta keys broadcast, state streams
    val fullBcastSec = t2(DedupOps.deltaMinhashPairs(
      Some(storeUnion(deep)), deltaEnr,
      storeBands = Some(bandsUnion(deep)), broadcastDelta = true).count())
    Console.err.println(
      f"[mm-incr-probe] level-$deep decomposition: enrich $enrichSec%.2f, " +
        f"band $bandSec%.2f, cand-join $candSec%.2f, " +
        f"verify(resid) $verifySec%.2f, full $fullSec%.2f s, " +
        f"full-bcast $fullBcastSec%.2f s")
    val json =
      s"""{"metric":"minhash_incr_per_append","sf_dir":"$sfDir",""" +
        s""""n_batches":$nBatches,"doc_rows":${docs.count()},""" +
        s""""levels":[${levels.map { case (l, lg, sk) =>
          f"""{"level":$l,"legacy_sec":$lg%.3f,"sunk_sec":$sk%.3f}"""
        }.mkString(",")}],""" +
        f""""total_legacy_sec":$totalLegacy%.3f,""" +
        f""""total_sunk_sec":$totalSunk%.3f,""" +
        f""""drop_pct":${100.0 * (totalLegacy - totalSunk) / totalLegacy}%.1f,""" +
        f""""deep_fold_decomposition":{"level":$deep,""" +
        f""""enrich_sec":$enrichSec%.3f,"band_sec":$bandSec%.3f,""" +
        f""""cand_join_sec":$candSec%.3f,"verify_resid_sec":$verifySec%.3f,""" +
        f""""full_sec":$fullSec%.3f,"full_bcast_sec":$fullBcastSec%.3f}}"""
    println(json)
    sys.env.get("SPARK_GRAFT_OUT").foreach { out =>
      Files.writeString(Paths.get(out), json + "\n")
    }
    spark.stop()
  }
}
