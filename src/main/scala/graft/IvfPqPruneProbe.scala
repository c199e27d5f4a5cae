package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}

/** Before/after stamp for the cell-partitioned IVF+PQ codes artifact
  * (r18, VERDICT r17 #2): tier 1 of `sim_ann_ivfpq` reads the codes
  * projection under a LITERAL `cell IN (routed)` predicate; with the
  * artifact written `partitionBy(cell)` that predicate is static
  * PartitionFilters directory pruning — this probe prices exactly that
  * term by scanning the SAME artifact (a) pruned to nprobe/nlist cells
  * and (b) in full, both forced (xxhash64 over every column, bit_xor
  * fold), and prints the pruned scan's PartitionFilters line as the
  * plan-shape witness (the spec twin is PlanGuardSpec's
  * ivfpq_partition_prune). Also times the full `sim_ann_ivfpq` ladder
  * end-to-end for the artifact-level before/after row in BENCH_NOTES.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.IvfPqPruneProbe
  * [nlist] [nprobe] */
object IvfPqPruneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nlist = if (args.nonEmpty) args(0).toInt else 8
    val nprobe = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_GRAFT_AUTOSIZE").contains("1"))
      ScaleConf.confEntries(ScaleConf.derive(
        ScaleConf.inputBytes(sfDir), cpus.toInt,
        ScaleConf.executorMemoryBytes(s"local[$cpus]")))
        .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .selectExpr("bit_xor(h)").head()
    def time(n: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[ivfpq-prune] $n%-34s $s%8.2f s  sf=$sfDir")
      s
    }

    // end-to-end ladder, cold then warm (the warm run reuses the sunk
    // artifact + fitted index/codebook — the per-probe cost)
    time("ann_ivfpq_e2e_cold") {
      force(operators.VectorOps.annIvfPq(emb, nlist = nlist, nprobe = nprobe))
    }
    time("ann_ivfpq_e2e_warm") {
      force(operators.VectorOps.annIvfPq(emb, nlist = nlist, nprobe = nprobe))
    }

    // tier-1 scan term, isolated: the same sunk artifact read pruned
    // (the routed literal IN — nprobe/nlist of the directories) vs full
    val codes = operators.VectorOps.ivfPqCodes(emb, nlist = nlist)
    val routed = (0 until nprobe).toSeq // any nprobe cells: cost, not recall
    val pruned = codes.filter(col("cell").isin(routed: _*))
    // plan-shape witness: the literal must land in PartitionFilters
    val scanLine = pruned.queryExecution.executedPlan.treeString
      .linesIterator.filter(_.contains("PartitionFilters")).take(1).toSeq
    println(s"[ivfpq-prune] ${scanLine.mkString.trim.take(200)}")
    require(scanLine.exists(_.contains("cell")),
      "routed literal did not land in PartitionFilters")
    (1 to 2).foreach(_ => force(pruned)) // warm
    val prunedSec = (1 to 3).map(_ => time("tier1_scan_pruned")(force(pruned))).min
    (1 to 2).foreach(_ => force(codes))
    val fullSec = (1 to 3).map(_ => time("tier1_scan_full")(force(codes))).min
    println(f"[ivfpq-prune] pruned/full = ${prunedSec / fullSec}%.3f " +
      f"(ideal ${nprobe.toDouble / nlist}%.3f)")
    spark.stop()
  }
}
