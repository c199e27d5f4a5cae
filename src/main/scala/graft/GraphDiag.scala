package graft

import org.apache.spark.sql.SparkSession

import graft.operators.GraphOps

/** Scratch diagnosis main for the graph family's sf10 cost split (the
  * [[Prof]] precedent): times pagerank at iters = 0/1/3 to separate the
  * bipartite projection build from the per-iteration edge join, then
  * prints the join/exchange skeleton of the final plan. Drive with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.GraphDiag`. */
object GraphDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    def time(n: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[graphdiag] $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    args.headOption.getOrElse("pagerank") match {
      case "pagerank" =>
        for (it <- Seq(0, 1, 3, 3)) {
          val r = GraphOps.pagerank(orders, li, iters = it)
          time(s"pagerank iters=$it") { r.collect(); () }
          org.apache.spark.sql.graftbridge.ColumnBridge
            .releaseAllCheckpoints(r)
        }
        val r = GraphOps.pagerank(orders, li, iters = 3)
        r.collect()
        println(r.queryExecution.executedPlan.treeString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange") ||
            l.contains("Scan") || l.contains("Aggregate"))
          .mkString("\n"))
      case "degree_stats" =>
        time("degree_stats")(GraphOps.degreeStats(orders, li).collect())
        time("degree_stats again")(GraphOps.degreeStats(orders, li).collect())
    }
    spark.stop()
  }
}
