package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64}
import scala.jdk.CollectionConverters._

/** Session-state drift probe (round-12 verdict #1): runs a query-name
  * prefix of the registry, then dissects a TARGET query's cost into
  * plan-build vs execution, alongside JVM counters (GC time, JIT
  * compilation time, code-cache occupancy, loaded classes) sampled
  * before/after each target run. Built to root-cause the `join_anti`
  * full-set plateau — a stable ~4x on a sub-second broadcast-anti plan
  * that appears only after ~80 prior queries, i.e. a capacity threshold
  * (codegen cache, JIT code cache, GC) rather than one culprit query.
  *
  * Usage: BenchDiag <target> [prefixCount]
  *   runs the first `prefixCount` registry queries in sorted order
  *   (default: all up to but excluding <target>), then the target 5x.
  */
object BenchDiag {
  case class Jvm(gcMs: Long, jitMs: Long, codeCacheMb: Double,
                 metaspaceMb: Double, classes: Long)
  def jvm(): Jvm = {
    import java.lang.management.ManagementFactory
    val gc = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val jit = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolMb(sub: String) = pools.filter(_.getName.contains(sub))
      .map(_.getUsage.getUsed / 1e6).sum
    Jvm(gc, jit, poolMb("CodeHeap") + poolMb("Code Cache"),
      poolMb("Metaspace"),
      ManagementFactory.getClassLoadingMXBean.getTotalLoadedClassCount)
  }

  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0) else "join_anti"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.muteBoundedGlobalWindowWarn
    LogHygiene.muteBlockExistsWarn
    spark.range(1000).selectExpr("sum(id)").collect()

    val sorted = SparkEntry.queries.keys.toSeq.sorted
    val prefixCount =
      if (args.length > 1) args(1).toInt else sorted.indexOf(target)
    val prefix = sorted.take(prefixCount).filterNot(_ == target)

    def force(name: String): Unit = {
      val df = SparkEntry.queries(name)(spark, sfDir)
      try df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .selectExpr("bit_xor(h)").head()
      finally org.apache.spark.sql.graftbridge.ColumnBridge.releaseAllCheckpoints(df)
    }

    def probe(tag: String): Unit = (1 to 5).foreach { i =>
      val j0 = jvm()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(target)(spark, sfDir)
      val plan = df.queryExecution.executedPlan // forces analysis+optimize+planning
      val tPlan = System.nanoTime()
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .selectExpr("bit_xor(h)").head()
      val tExec = System.nanoTime()
      org.apache.spark.sql.graftbridge.ColumnBridge.releaseAllCheckpoints(df)
      val j1 = jvm()
      println(f"[diag] $tag run$i plan=${(tPlan - t0) / 1e9}%.3f exec=${(tExec - tPlan) / 1e9}%.3f " +
        f"dGC=${j1.gcMs - j0.gcMs}ms dJIT=${j1.jitMs - j0.jitMs}ms " +
        f"codeCache=${j1.codeCacheMb}%.0fMB metaspace=${j1.metaspaceMb}%.0fMB classes=${j1.classes}")
      val _ = plan
    }

    // SPARK_GRAFT_DIAG_EXECS: executions per prefix query (Bench runs
    // warm + timed + retries, i.e. >= 2; the plateau under study needs
    // the EXECUTION count, not the unique-plan count, to cross ~200)
    val execs = sys.env.get("SPARK_GRAFT_DIAG_EXECS").map(_.toInt).getOrElse(1)
    // SPARK_GRAFT_DIAG_IVF=1 replays Bench's IVF warm-up (KMeans fit +
    // persisted index) — the one Bench step this probe doesn't share
    if (sys.env.get("SPARK_GRAFT_DIAG_IVF").contains("1")) {
      try operators.VectorOps.annIvf(Tables.embeddings(spark, sfDir)).count()
      catch { case _: Throwable => }
      println("[diag] IVF warm-up done")
    }
    probe("cold")
    var done = 0
    prefix.foreach { n =>
      (1 to execs).foreach { _ =>
        try force(n) catch { case e: Throwable =>
          System.err.println(s"[diag] prefix $n failed: ${e.getMessage}") }
      }
      done += 1
      if (done % 20 == 0) {
        println(s"[diag] after $done prefix queries:")
        probe(s"after$done")
      }
    }
    println(s"[diag] after FULL prefix ($done):")
    probe("warm")
    spark.stop()
  }
}
