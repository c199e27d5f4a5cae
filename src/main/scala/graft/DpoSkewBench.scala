package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures `pipeline_dpo_format`'s mega-language salt tier on the
  * corpus shape it exists for (r12 verdict #6): a 90%-one-language
  * corpus, where the per-lang rank window funnels ~all rows through ONE
  * task. Skews the generated documents deterministically
  * (doc_id % 10 < 9 → 'en'), then runs dpoFormat twice on the SAME
  * frame: default conf (all-window path — the single hot partition) vs
  * `spark.graft.dpo.maxLangRows` low enough to route 'en' through the
  * Skew.distributedRowNumber salt tier. Prints one JSON line with both
  * timings and the (equal) pair counts, and writes
  * docs/DPO_SKEW_<tag>.json.
  *
  * At local SF the two paths are near-par (the salt tier's range
  * sampling + offset jobs ≈ the single window's sort) — the point the
  * artifact pins is (a) the tier activates and returns IDENTICAL pairs
  * on a 90%-skewed corpus at bench scale, and (b) the cost envelope of
  * the machinery that, at 100 TB, replaces an un-runnable 10¹¹-row
  * single-task sort.
  */
object DpoSkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val tag = sys.env.getOrElse("SPARK_GRAFT_BENCH_TAG", "SF01")
    val knob = sys.env.get("SPARK_GRAFT_DPO_KNOB").map(_.toLong).getOrElse(10000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.muteBoundedGlobalWindowWarn

    val skewed = Tables.documents(spark, sfDir)
      .withColumn("lang",
        when(pmod(col("doc_id"), lit(10)) < 9, lit("en")).otherwise(col("lang")))

    def time(label: String, conf: Option[Long]): (Double, Long) = {
      conf match {
        case Some(v) => spark.conf.set("spark.graft.dpo.maxLangRows", v.toString)
        case None => spark.conf.unset("spark.graft.dpo.maxLangRows")
      }
      // warm + timed (the Bench discipline): min of 2 timed runs
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val df = operators.CorpusOps.dpoFormat(skewed)
        val n = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.graftbridge.ColumnBridge.releaseAllCheckpoints(df)
        (sec, n)
      }
      once()
      val runs = Seq(once(), once())
      (runs.map(_._1).min, runs.head._2)
    }

    val (windowSec, windowPairs) = time("window", None)
    val (saltSec, saltPairs) = time("salt", Some(knob))
    require(windowPairs == saltPairs,
      s"salt tier diverged: $windowPairs vs $saltPairs pairs")
    val json = f"""{"bench":"dpo_skew","sf":"$sfDir","skew":"90pct-en",""" +
      f""""knob":$knob,"window_sec":$windowSec%.3f,"salt_sec":$saltSec%.3f,""" +
      f""""pairs":$windowPairs,"loadavg":"${loadavg()}"}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"docs/DPO_SKEW_$tag.json"), json + "\n")
    spark.stop()
  }

  private def loadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ").take(3).mkString(",")
    catch { case _: Throwable => "?" }
}
