package graft
import org.apache.spark.sql.SparkSession
/** Prints physical plans of representative queries for the scale audit —
  * run after operator changes to confirm pushdown/broadcast/codegen hold. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_MASTER / SPARK_GRAFT_CLASSES: audit plans under
    // local-cluster executors (r9 verdict #5 — a broadcast can demote
    // under small executors, and only a cluster-mode dump shows it);
    // SPARK_GRAFT_ONLY restricts the query list; SPARK_GRAFT_EXEC=1
    // EXECUTES each query first so the printed tree is the AQE FINAL
    // plan (runtime join-strategy changes included), not the initial.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]")
    val builder = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster"))
      builder.config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSES",
          "/root/repo/target/scala-2.13/classes"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val exec = sys.env.get("SPARK_GRAFT_EXEC").contains("1")
    val names = Seq("scan_project", "filter_pred", "join_broadcast",
      "join_theta_range", "join_range_bucket", "agg_hash_group",
      "join_multiway", "sim_cosine_topk", "sort_limit_topk",
      "q3_shipping_priority", "q5_local_supplier", "dedup_exact_hash",
      "dedup_ngram_jaccard", "sim_batch_topk",
      // round 3: corpus-preparation passes
      "pipeline_decontaminate", "pipeline_pack_chunks", "text_lm_score",
      "join_skew_salted", "sample_mixture", "filter_quality_quantile",
      // round 3 late: retrieval + histogram
      "retrieval_bm25", "pipeline_chunk_overlap", "agg_histogram",
      // round 6: emit-once pair join + the sweep-count alternative
      "join_interval_overlap", "ts_concurrency",
      // round 9: one-exchange windows, broadcast-pinned stats joins,
      // integer-exact iterative graph, map-only up-sampler
      "ts_retention", "ts_funnel_steps", "window_running_distinct",
      "text_kn_bigram", "graph_pagerank", "pipeline_repeat_epochs",
      "ts_mad_outliers", "emb_dim_stats")
    val selected = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(names)
    selected.foreach { n =>
      println(s"\n================ $n ================")
      val df = SparkEntry.queries(n)(spark, d)
      if (exec) df.count()
      println(df.queryExecution.executedPlan
        .treeString.linesIterator.take(60).mkString("\n"))
      org.apache.spark.sql.graftbridge.ColumnBridge.releaseAllCheckpoints(df)
    }
    spark.stop()
  }
}
