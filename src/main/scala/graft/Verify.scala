package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // SPARK_GRAFT_SQL_ONLY=1: dump oracle_sql.json and exit without a
    // SparkSession — feeds tools/audit_oracle_types.py (the DuckDB
    // DESCRIBE type gate) in seconds instead of a full verify run.
    if (sys.env.get("SPARK_GRAFT_SQL_ONLY").contains("1")) {
      new java.io.File(outDir).mkdirs()
      writeOracleJson(outDir)
      return
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[2,4,2048] runs the whole gate with
    // real executor JVMs (separate processes, real serialization + shuffle
    // transport) — the closest no-cluster approximation of multi-executor
    // execution. Executors need the library classes on their classpath.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_AUTOSIZE=1: data-derived sizing knobs (see ScaleConf
    // and Bench — same contract); default stays pinned for gate
    // comparability across rounds.
    if (sys.env.get("SPARK_GRAFT_AUTOSIZE").contains("1"))
      ScaleConf.confEntries(ScaleConf.derive(
        ScaleConf.inputBytes(sfDir), cpus.toInt,
        // per-EXECUTOR heap, not the driver's (r9 ADVICE)
        ScaleConf.executorMemoryBytes(master)))
        .foreach { case (k, v) => builder.config(k, v) }
    if (master.startsWith("local-cluster")) {
      builder.config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSES",
          "/root/repo/target/scala-2.13/classes"))
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogHygiene.muteBoundedGlobalWindowWarn
    LogHygiene.muteBlockExistsWarn
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c restricts the dump to named queries — local
    // iteration aid; the driver sets nothing and gets the full gate
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      // release each frame's invocation-private checkpoint pins once its
      // rows are written — 162 queries share this JVM (r8 ADVICE leak)
      try {
        val df = fn(spark, sfDir)
        try df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        finally org.apache.spark.sql.graftbridge.ColumnBridge
          .releaseAllCheckpoints(df)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // dynamic entries (fitted-parameter oracles, r15): resolved with the
    // live session so the inlined literals are the exact model state the
    // queries' own runs used (cachedIvfIndex / deterministic pcaAxis).
    // FAIL-CLOSED (r16, ADVICE r15): a resolution failure must not zero
    // the static oracles, but it must not silently shrink the gate
    // either — every expected dynamic slug that did not resolve gets an
    // `error(...)`-raising oracle, so DuckDB fails THAT slug and the
    // driver records a failure instead of `no_oracle`.
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] dynamic oracles failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val failClosed = SparkEntry.dynamicOracleSlugs.map { slug =>
      slug -> dynamic.getOrElse(slug,
        s"SELECT error('dynamic oracle for $slug failed to resolve at dump time')")
    }.toMap
    writeOracleJson(outDir, failClosed)
    spark.stop()
  }

  /** Dumps SparkEntry.oracleSql as JSON for the driver's DuckDB compare.
    * JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private[graft] def writeOracleJson(outDir: String,
      dynamic: Map[String, String] = Map.empty): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = (SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
