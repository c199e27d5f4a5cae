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
