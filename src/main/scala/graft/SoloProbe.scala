package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}

import scala.jdk.CollectionConverters._

/** Solo cold-JVM stage-split probe — the r18 adjudication protocol
  * (VERDICT r18 Next #2) as a reusable main instead of per-family
  * scratch code ([[GraphDiag]]/[[Prof]]): run ONE registry query in a
  * fresh JVM (cold = invoke once per query via `java`), min-of-2, and
  * decompose each run's wall into completed Spark stages with their
  * executor time, shuffle bytes, and spill — the event-log evidence
  * that separates a real plan defect (a stage whose cost moved) from
  * host drift (every stage uniformly slower).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  * SPARK_GRAFT_AUTOSIZE=1 runMain graft.SoloProbe <query> [runs]`.
  * Session sizing mirrors [[Bench]] (same env knobs) so readings are
  * comparable with the committed sf10 artifacts. Forces full columns
  * (the xxhash64 device) like `SPARK_GRAFT_FORCE=1` bench mode. */
object SoloProbe {
  private final case class StageRow(id: Int, name: String, wallMs: Long,
      execMs: Long, tasks: Int, inputMB: Long, shufReadMB: Long,
      shufWriteMB: Long, spillMB: Long)

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse(sys.error("usage: SoloProbe <query> [runs]"))
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_PROJSTORE overrides the durable projection store path
    // (default DISABLED since the r19 optimization round: a measured run
    // computes from the parquet inputs; set a dir to probe the
    // deployment's store-hit path explicitly)
    sys.env.get("SPARK_GRAFT_PROJSTORE").foreach(p =>
      builder.config("spark.graft.projection.store", p))
    if (sys.env.get("SPARK_GRAFT_AUTOSIZE").contains("1")) {
      val sizing = ScaleConf.derive(ScaleConf.inputBytes(sfDir),
        totalCores = cpus.toInt,
        executorMemoryBytes = ScaleConf.executorMemoryBytes(s"local[$cpus]"))
      ScaleConf.confEntries(sizing).foreach { case (k, v) =>
        if (!(k == "spark.sql.shuffle.partitions" &&
            sys.env.contains("SPARK_GRAFT_SHUFFLE_PARTITIONS")))
          builder.config(k, v)
      }
      System.err.println(s"[probe] autosize: $sizing")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LogHygiene.muteBoundedGlobalWindowWarn
    LogHygiene.muteBlockExistsWarn
    spark.range(1000).selectExpr("sum(id)").collect()

    val stages = new ConcurrentLinkedQueue[StageRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for (s <- si.submissionTime; c <- si.completionTime)
          yield c - s).getOrElse(-1L)
        stages.add(StageRow(si.stageId,
          si.name.linesIterator.next().take(90), wall,
          m.executorRunTime, si.numTasks,
          m.inputMetrics.bytesRead >> 20,
          (m.shuffleReadMetrics.remoteBytesRead +
            m.shuffleReadMetrics.localBytesRead) >> 20,
          m.shuffleWriteMetrics.bytesWritten >> 20,
          (m.memoryBytesSpilled + m.diskBytesSpilled) >> 20))
      }
    })

    val times = (1 to runs).map { r =>
      stages.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(query)(spark, sfDir)
      val h =
        try df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .selectExpr("bit_xor(h)").head().get(0)
        finally org.apache.spark.sql.graftbridge.ColumnBridge
          .releaseAllCheckpoints(df)
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftbridge.ColumnBridge
        .drainListenerBus(spark.sparkContext)
      println(f"[probe] $query run $r: $secs%.1f s (hash $h)")
      val rows = stages.asScala.toSeq.sortBy(-_.wallMs)
      println(f"[probe]   ${"stage"}%-7s ${"wall_s"}%7s ${"exec_s"}%7s " +
        f"${"tasks"}%5s ${"in_MB"}%7s ${"shR_MB"}%7s ${"shW_MB"}%7s " +
        f"${"spill"}%6s  name")
      rows.takeWhile(_.wallMs > math.max(200L, rows.head.wallMs / 50))
        .foreach { s =>
          println(f"[probe]   ${s.id}%-7d ${s.wallMs / 1e3}%7.1f " +
            f"${s.execMs / 1e3}%7.1f ${s.tasks}%5d ${s.inputMB}%7d " +
            f"${s.shufReadMB}%7d ${s.shufWriteMB}%7d ${s.spillMB}%6d  ${s.name}")
        }
      secs
    }
    println(f"[probe] $query min-of-$runs: ${times.min}%.1f s " +
      f"(all: ${times.map(t => f"$t%.1f").mkString(", ")})")
    spark.stop()
  }
}
