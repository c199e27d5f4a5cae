package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes `.explain("formatted")` for named registry queries to files —
  * the optimization rounds' plan-evidence artifact
  * (`plans/r<N>/<query>_{before,after}.txt`; the judge checks plan
  * claims against these files without running Spark).
  *
  * Usage: `runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]`
  * — writes `<outDir>/<query>_<suffix>.txt` per query. Session sizing
  * mirrors [[Bench]]'s env knobs (`SPARK_GRAFT_CPUS`) so plan shapes
  * (e.g. AQE-initial partition specs) match what the bench executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,..> [sfDir]")
    val outDir = args(0)
    val suffix = args(1)
    val queries = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    queries.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      org.apache.spark.sql.graftbridge.ColumnBridge.releaseAllCheckpoints(df)
      println(s"[plandump] wrote $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
