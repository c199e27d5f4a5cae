package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.DedupOps
import graft.sources.InMemoryBus

/** State-size soak for the RocksDB-backed stateful maintainers (r18,
  * VERDICT r17 #5): the scaladocs claim the span gate's per-distinct-
  * hash state is "RocksDB territory at corpus scale" — this stamps the
  * claim with numbers instead of prose. Two soaks:
  *
  *  1. SPAN GATE (fMGWS inside the bus runner, RocksDB provider):
  *     `cycles` stop/resume rounds, each publishing `docsPerCycle`
  *     synthetic documents whose spans are ~50% boilerplate (repeated
  *     across docs/cycles — the state must NOT grow for them) and ~50%
  *     fresh. Per cycle: distinct-span state rows, the provider's
  *     reported state bytes (stateOperators.memoryUsedBytes — for
  *     RocksDB this is the SST+memtable estimate), and wall seconds.
  *     Pass = state rows grow by ~the fresh-span count only, never by
  *     the boilerplate re-publishes, across EVERY restart boundary.
  *
  *  2. MINHASH MAINTAINER (versioned parquet state, RocksDB provider on
  *     the session): per fold, the committed version's on-disk bytes
  *     split by table (store / bands / pairs) — the retention-GC'd
  *     footprint a deployment provisions for.
  *
  * Writes `docs/STATESOAK_R19.json` (override: SPARK_GRAFT_STATESOAK)
  * and prints one JSON line. Knobs: SPARK_GRAFT_SOAK_DOCS (per cycle,
  * default 2000), SPARK_GRAFT_SOAK_CYCLES (default 4). r19 adds the
  * per-stage wall decomposition (update/commit/addBatch ms per cycle)
  * so state-rescan vs provider-commit vs host drift are separable. */
object StateSoak {
  private def dirBytes(p: Path): Long = {
    if (!Files.isDirectory(p)) return 0L
    val w = Files.walk(p)
    try w.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    finally w.close()
  }

  def main(args: Array[String]): Unit = {
    val docsPerCycle = sys.env.getOrElse("SPARK_GRAFT_SOAK_DOCS", "2000").toInt
    val cycles = sys.env.getOrElse("SPARK_GRAFT_SOAK_CYCLES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val id = java.util.UUID.randomUUID().toString.take(8)

    // ---- soak 1: the fMGWS span gate under RocksDB ------------------
    val (inTopic, inSub) = (s"ss-in-$id", s"ss-insub-$id")
    val (outTopic, outSub) = (s"ss-out-$id", s"ss-outsub-$id")
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string").add("lang", "string")
    val ckpt = Files.createTempDirectory("ss-ckpt-").toString
    def mkPipeline() = new Pipeline(spark, inSub, outTopic,
      JsonSerde(schema),
      transform = df => DedupOps.spanRewriteStream(
        df.select(col("payload.doc_id").as("doc_id"),
          col("payload.text").as("text"),
          col("payload.lang").as("lang")),
        k = 3).toDF(),
      checkpointDir = ckpt)
    // boilerplate + fresh mix: doc i = BOILER (6 words = 2 spans at
    // k=3, shared corpus-wide, dead-on-arrival after the first doc) +
    // 3 unique words (1 fresh span forever) => 3 spans/doc, of which
    // exactly one grows state (ADVICE r18 #4: the old comment
    // miscounted 9 words as 2 spans)
    val boiler = "terms of service apply here now"
    val boilerSpans = 2L
    def publishDocs(cycle: Int): Unit = (0 until docsPerCycle).foreach { i =>
      val d = cycle.toLong * docsPerCycle + i
      InMemoryBus.publish(inTopic,
        s"""{"doc_id":$d,"text":"$boiler unique$d token$d word$d","lang":"en"}"""
          .getBytes(UTF_8))
    }
    val spanCycles = (0 until cycles).map { c =>
      publishDocs(c)
      val t0 = System.nanoTime()
      val q = mkPipeline().start(availableNow = true)
      q.awaitTermination(300000)
      val secs = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.toSeq
      val sos = progs.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      val rows = if (sos.isEmpty) -1L else sos.map(_.numRowsTotal).max
      val mem = if (sos.isEmpty) -1L else sos.map(_.memoryUsedBytes).max
      // per-stage wall decomposition (r19, VERDICT r18 Next #4): does
      // per-batch cost ride TOTAL state size or touched keys? Stamp the
      // state operator's own phase clocks (update = gate work incl.
      // state point-reads, commit = provider snapshot/flush) plus the
      // batch-level addBatch wall — if only commit grows with |state|
      // the provider is the rider; if update grows, the gate rescans
      val updMs = sos.map(_.allUpdatesTimeMs).sum
      val rmMs = sos.map(_.allRemovalsTimeMs).sum
      val commitMs = sos.map(_.commitTimeMs).sum
      val addBatchMs = progs.flatMap(p =>
        Option(p.durationMs).map(_.getOrDefault("addBatch", 0L).toLong)).sum
      Console.err.println(
        f"[state-soak] span cycle $c: state rows $rows, state bytes $mem, " +
          f"$secs%.1f s (update ${updMs}ms, commit ${commitMs}ms, " +
          f"rm ${rmMs}ms, addBatch ${addBatchMs}ms)")
      (c, rows, mem, secs, updMs, commitMs, addBatchMs)
    }
    // the 2 boilerplate spans are stored ONCE ever; each doc adds
    // exactly 1 fresh span. The hard pass gate is EXACT (ADVICE r18
    // #4 — the old *2 slack would have passed per-message growth):
    // rows after the LAST cycle == cycles*docsPerCycle + boilerSpans,
    // i.e. growth is per-FRESH-span, not per-message or per-span
    val expected = cycles.toLong * docsPerCycle + boilerSpans
    val finalRows = spanCycles.last._2
    require(finalRows == expected,
      s"span state rows $finalRows != expected $expected " +
        "(per-fresh-span growth violated)")

    // ---- soak 2: the minhash maintainer's versioned parquet state ---
    val (mTopic, mSub) = (s"ssm-in-$id", s"ssm-insub-$id")
    InMemoryBus.createTopic(mTopic); InMemoryBus.createSubscription(mTopic, mSub)
    val stateDir = Files.createTempDirectory("ss-mm-state-").toString
    val mCkpt = Files.createTempDirectory("ss-mm-ckpt-").toString
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val mDocs = math.max(200, docsPerCycle / 10)
    val mmCycles = (0 until cycles).map { c =>
      (0 until mDocs).foreach { i =>
        val d = c.toLong * mDocs + i
        // every 10th doc reuses one of 50 shared texts — exact
        // duplicates landing in DIFFERENT cycles, so the pairs table
        // must grow via the delta-vs-RESTORED-store join, not
        // batch-local luck; the rest are unique 9-word docs
        val key = if (d % 10 == 0) d / 10 % 50 else d
        val text = (0 until 8).map(j => words(((key * 7 + j * 3) % 12).toInt))
          .mkString(" ")
        InMemoryBus.publish(mTopic,
          s"""{"doc_id":$d,"text":"$text $key"}""".getBytes(UTF_8))
      }
      val m = new MinhashMaintenance(spark, mSub, stateDir, mCkpt,
        bulkLimit = mDocs)
      val t0 = System.nanoTime()
      val q = m.start(availableNow = true)
      q.awaitTermination(300000)
      val secs = (System.nanoTime() - t0) / 1e9
      val last = m.lastApplied()
      val v = Paths.get(stateDir, s"v$last")
      val (sB, bB, pB) = (dirBytes(v.resolve("store")),
        dirBytes(v.resolve("bands")), dirBytes(v.resolve("pairs")))
      Console.err.println(
        f"[state-soak] minhash cycle $c (v$last): store ${sB / 1024} KiB, " +
          f"bands ${bB / 1024} KiB, pairs ${pB / 1024} KiB, $secs%.1f s")
      (c, last, sB, bB, pB, secs)
    }

    val json =
      s"""{"metric":"state_soak","provider":"rocksdb",""" +
        s""""docs_per_cycle":$docsPerCycle,"cycles":$cycles,""" +
        s""""span_gate":[${spanCycles.map { case (c, r, m, s, u, cm, ab) =>
          f"""{"cycle":$c,"state_rows":$r,"state_bytes":$m,"sec":$s%.1f,""" +
            f""""update_ms":$u,"commit_ms":$cm,"add_batch_ms":$ab}"""
        }.mkString(",")}],""" +
        s""""minhash_maintainer":[${mmCycles.map { case (c, v, sB, bB, pB, s) =>
          f"""{"cycle":$c,"version":$v,"store_bytes":$sB,""" +
            f""""bands_bytes":$bB,"pairs_bytes":$pB,"sec":$s%.1f}"""
        }.mkString(",")}]}"""
    println(json)
    val path = sys.env.getOrElse("SPARK_GRAFT_STATESOAK",
      "/root/repo/docs/STATESOAK_R19.json")
    Files.writeString(Paths.get(path), json + "\n")
    spark.stop()
  }
}
