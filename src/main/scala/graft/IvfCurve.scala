package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Publishes the IVF recall-vs-nprobe curve: for a probe set, recall@k
  * of the cell-bucketed IVF probe against the exact batch sweep at
  * doubling `nprobe`, with the probe-side wall clock — the tuning table
  * an operator of the index reads to pick nprobe for a recall target
  * (the probe cost model is nprobe/nlist of the corpus; the curve shows
  * what that fraction actually buys on clustered data). The exact
  * baseline and every IVF pass share one SparkSession and take a warm
  * run before timing, same methodology as graft.Bench.
  *
  * Usage: runMain graft.IvfCurve <sfDir> [nlist] [nProbes] [k] [outJson]
  */
object IvfCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nlist = if (args.length > 1) args(1).toInt else 64
    val nProbes = if (args.length > 2) args(2).toInt else 50
    val k = if (args.length > 3) args(3).toInt else 10
    val out =
      if (args.length > 4) args(4) else "/root/repo/docs/IVF_CURVE.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val nVecs = emb.count()

    def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("probe_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // exact ground truth: one corpus sweep serves every probe
    val exact = topkSets(operators.VectorOps.batchCosineTopK(emb, nProbes, k))

    val t0 = System.nanoTime()
    val index = operators.VectorOps.buildIvfIndex(emb, nlist)
    val buildSec = (System.nanoTime() - t0) / 1e9
    val probes = emb.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe"))

    val points = Iterator.iterate(1)(_ * 2).takeWhile(_ <= nlist).map { np =>
      operators.VectorOps.ivfProbeBatch(index, probes, k, np).count() // warm
      val t1 = System.nanoTime()
      val got = topkSets(operators.VectorOps.ivfProbeBatch(index, probes, k, np))
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = exact.map { case (p, want) =>
        got.getOrElse(p, Set.empty).count(want) / want.size.toDouble
      }.sum / exact.size
      println(f"[ivf] nprobe=$np%3d recall@$k=$recall%.4f probe=$sec%.2fs")
      f"""    {"nprobe": $np, "recall": $recall%.4f, "probe_sec": $sec%.3f}"""
    }.toSeq

    val json =
      s"""{
         |  "sf": "$sfDir",
         |  "n_vecs": $nVecs,
         |  "nlist": $nlist,
         |  "k": $k,
         |  "n_probes": $nProbes,
         |  "build_sec": ${f"$buildSec%.2f"},
         |  "curve": [
         |${points.mkString(",\n")}
         |  ]
         |}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[ivf] wrote $out")
    spark.stop()
  }
}

/** The IVF+PQ operating-point curve (r18, VERDICT r17 #6): recall@k of
  * [[graft.operators.VectorOps.annIvfPqBatch]] against the exact batch
  * sweep over the (nprobe × topR) grid, with per-point probe wall
  * clock — the FAISS-style tuning table a deployment reads to pick its
  * operating point (`retrieval_ivfpq_recall` audits ONE point; this
  * publishes the tradeoff). Monotonicity note: recall is EXACTLY
  * non-decreasing in topR at fixed nprobe (the ADC survivor prefix is
  * nested, and the rerank is exact over a superset); in nprobe it is
  * non-decreasing up to ADC displacement noise (a larger candidate pool
  * can push a true neighbor out of a SMALL topR) — the spec pins the
  * first exactly and the second within a small tolerance.
  *
  * Usage: runMain graft.IvfPqCurve <sfDir> [nlist] [nProbes] [k]
  * [outJson] [m] [kCent] [topRs]
  * (`m` sweeps the PQ subspace count — the r18 sf10 curve showed recall
  * plateauing ~0.27 INDEPENDENT of nprobe at 200k vectors: the 32-bit
  * m=8 code is the ceiling there, and the deployment lever is code
  * resolution, not probe width; m=16 doubles the code to 64 bits.
  * r19 adds the other resolution lever, `kCent` = centroids per
  * subspace (default 16 = 4-bit; 64/256 = 6/8-bit, the FAISS-standard
  * axis), and a CSV `topRs` override so the rerank-depth axis extends
  * past 200 — VERDICT r18 Next #6.)
  */
object IvfPqCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nlist = if (args.length > 1) args(1).toInt else 8
    val nProbes = if (args.length > 2) args(2).toInt else 50
    val k = if (args.length > 3) args(3).toInt else 10
    val out =
      if (args.length > 4) args(4) else "/root/repo/docs/IVFPQ_CURVE_R18.json"
    val m = if (args.length > 5) args(5).toInt else 8
    val kCent = if (args.length > 6) args(6).toInt else 16
    val topRsArg: Seq[Int] =
      if (args.length > 7) args(7).split(",").map(_.trim.toInt).toSeq
      else Seq(20, 50, 100, 200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val nVecs = emb.count()

    def topkSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("probe_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val exact = topkSets(operators.VectorOps.batchCosineTopK(emb, nProbes, k))

    val t0 = System.nanoTime()
    // one warm pass fits the IVF index + PQ codebook and sinks the
    // cell-partitioned codes artifact; every grid point reuses them
    operators.VectorOps.annIvfPqBatch(emb, nProbes, k, topR = 20,
      nlist = nlist, nprobe = 1, m = m, k = kCent).count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val nprobes = Iterator.iterate(1)(_ * 2).takeWhile(_ <= nlist).toSeq
    val topRs = topRsArg
    val points = for (np <- nprobes; tr <- topRs) yield {
      operators.VectorOps.annIvfPqBatch(emb, nProbes, k, tr, nlist, np,
        m = m, k = kCent).count() // warm
      val t1 = System.nanoTime()
      val got = topkSets(
        operators.VectorOps.annIvfPqBatch(emb, nProbes, k, tr, nlist, np,
          m = m, k = kCent))
      val sec = (System.nanoTime() - t1) / 1e9
      val recall = exact.map { case (p, want) =>
        got.getOrElse(p, Set.empty).count(want) / want.size.toDouble
      }.sum / exact.size
      println(f"[ivfpq] nprobe=$np%3d topR=$tr%4d recall@$k=$recall%.4f " +
        f"probe=$sec%.2fs")
      f"""    {"nprobe": $np, "topR": $tr, "recall": $recall%.4f, "probe_sec": $sec%.3f}"""
    }

    val json =
      s"""{
         |  "sf": "$sfDir",
         |  "n_vecs": $nVecs,
         |  "nlist": $nlist,
         |  "m": $m,
         |  "k_cent": $kCent,
         |  "k": $k,
         |  "n_probes": $nProbes,
         |  "build_sec": ${f"$buildSec%.2f"},
         |  "curve": [
         |${points.mkString(",\n")}
         |  ]
         |}
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[ivfpq] wrote $out")
    spark.stop()
  }
}
