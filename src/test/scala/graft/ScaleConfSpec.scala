package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the data-derived session sizing at BOTH ends of the scale the
  * brief cares about: the local gate SFs this repo can measure, and the
  * 100 TB / 1000-executor target it must extrapolate to. The derivation
  * is pure, so the cluster end is testable without a cluster. */
class ScaleConfSpec extends AnyFunSuite {
  private val GiB = 1L << 30
  private val MiB = 1L << 20

  test("tiny SF: floor is 2x cores, waves are full, scans still split") {
    // sf0.01 footprint ~10 MiB on a 32-core box
    val s = ScaleConf.derive(10 * MiB, totalCores = 32,
      executorMemoryBytes = 8 * GiB)
    assert(s.shufflePartitions == 64, "floor = 2x cores")
    assert(s.shufflePartitions % 32 == 0, "full waves")
    // one 128 MiB split would serialize the scan behind one task
    assert(s.maxPartitionBytes == ScaleConf.MinFileSplitBytes)
  }

  test("mid scale: partition count tracks data at ~128 MiB each") {
    // 1 TiB on 400 cores (50 executors x 8)
    val s = ScaleConf.derive(1L << 40, totalCores = 400,
      executorMemoryBytes = 16 * GiB)
    assert(s.shufflePartitions >= 8192, "1 TiB / 128 MiB = 8192 minimum")
    assert(s.shufflePartitions % 400 == 0, "full waves")
    assert(s.shufflePartitionBytes <= ScaleConf.TargetShufflePartitionBytes,
      "per-partition bytes at or under target")
    assert(s.maxPartitionBytes == ScaleConf.DefaultFileSplitBytes,
      "big data keeps the stock 128 MiB scan split")
  }

  test("100 TB / 1000 executors: cap bites, per-partition size is reported honestly") {
    val cores = 1000 * 8
    val s = ScaleConf.derive(100L << 40, totalCores = cores,
      executorMemoryBytes = 32 * GiB)
    assert(s.shufflePartitions == ScaleConf.MaxShufflePartitions,
      "100 TB / 128 MiB = 819k would swamp the map-output tracker; capped")
    // at the cap each partition carries ~550 MiB — the Sizing must SAY so
    // (the caller's cue to add executors or memory), not pretend 128 MiB
    assert(s.shufflePartitionBytes > 500L * MiB &&
      s.shufflePartitionBytes < 600L * MiB,
      s"honest per-partition bytes at cap: ${s.shufflePartitionBytes}")
    // 32 GiB executors can afford a bigger automatic broadcast side
    assert(s.broadcastThresholdBytes == ScaleConf.MaxBroadcastBytes)
  }

  test("monotone: more data never means fewer partitions or smaller splits") {
    val sizes = Seq(1L * MiB, 100L * MiB, 10L * GiB, 1L << 40, 100L << 40)
    val derived = sizes.map(ScaleConf.derive(_, 32, 8 * GiB))
    derived.sliding(2).foreach { case Seq(a, b) =>
      assert(a.shufflePartitions <= b.shufflePartitions)
      assert(a.maxPartitionBytes <= b.maxPartitionBytes)
    }
  }

  test("small executors keep the stock broadcast threshold") {
    val s = ScaleConf.derive(10L * GiB, 32, executorMemoryBytes = 2 * GiB)
    assert(s.broadcastThresholdBytes == ScaleConf.MinBroadcastBytes)
  }

  test("inputBytes sums the SF directory's parquet footprint") {
    val b = ScaleConf.inputBytes("/root/testdata/sf0.001")
    assert(b > 100_000L && b < 100L * MiB, s"sf0.001 footprint: $b")
    val b2 = ScaleConf.inputBytes("/root/testdata/sf0.01")
    assert(b2 > b, "sf0.01 must outweigh sf0.001")
    assert(ScaleConf.inputBytes("/nonexistent/dir") == 0L)
  }

  test("inputBytes on a file:// URI routes through the Hadoop FS and agrees with the local walk (r9 verdict #6)") {
    // same interface a real HDFS/S3 path uses — getContentSummary over
    // LocalFileSystem; the two routes may differ only by non-parquet
    // droppings (none in the driver-generated layout, so equal here)
    val local = ScaleConf.inputBytes("/root/testdata/sf0.001")
    val viaFs = ScaleConf.inputBytes("file:///root/testdata/sf0.001")
    assert(viaFs == local, s"fs route $viaFs != local walk $local")
    assert(ScaleConf.inputBytes("file:///nonexistent/dir") == 0L)
    // the direct API is usable with any Configuration (cluster callers)
    assert(ScaleConf.inputBytesFs("file:///root/testdata/sf0.001",
      new org.apache.hadoop.conf.Configuration()) == local)
  }

  test("executorMemoryBytes: per-executor heap, not the driver's (r9 ADVICE)") {
    // local-cluster masters carry executor memory in MB in the master
    // string — a 2048 MB executor must NOT inherit a huge driver heap
    assert(ScaleConf.executorMemoryBytes("local-cluster[2,4,2048]")
      == 2048L * MiB)
    assert(ScaleConf.executorMemoryBytes("local-cluster[ 8, 4, 512 ]")
      == 512L * MiB)
    // in-process local[n]: the driver heap IS the executor heap
    assert(ScaleConf.executorMemoryBytes("local[32]")
      == Runtime.getRuntime.maxMemory)
    // unknown cluster master with no conf: Spark's stock 1g default
    assert(ScaleConf.executorMemoryBytes("spark://host:7077")
      == 1024L * MiB)
    // suffix-less spark.executor.memory is MiB in Spark's own parsing
    // (getSizeAsMb) — parseMemory's bare-bytes rule must not read
    // "2048" as 2 KB on this fallback path (r10 ADVICE)
    val prev = sys.props.get("spark.executor.memory")
    try {
      sys.props("spark.executor.memory") = "2048"
      assert(ScaleConf.executorMemoryBytes("spark://host:7077")
        == 2048L * MiB)
      sys.props("spark.executor.memory") = "3g"
      assert(ScaleConf.executorMemoryBytes("spark://host:7077")
        == 3L * GiB)
    } finally prev match {
      case Some(v) => sys.props("spark.executor.memory") = v
      case None => sys.props.remove("spark.executor.memory")
    }
    // and the derived broadcast threshold actually shrinks with it:
    // 2 GiB executors stay at the stock 10 MiB however big the driver is
    val s = ScaleConf.derive(10L * GiB, 8,
      ScaleConf.executorMemoryBytes("local-cluster[2,4,2048]"))
    assert(s.broadcastThresholdBytes == ScaleConf.MinBroadcastBytes)
  }

  test("parseMemory reads Spark-style memory strings (suffix-less = MiB, ONE semantics — r11 verdict #6)") {
    // bare numbers are MiB everywhere, mirroring Spark's own memory-knob
    // parsing (JavaUtils.byteStringAsMb): the env path and the sys-prop
    // path must agree — "2048" is 2 GiB on both, never 2 KB
    assert(ScaleConf.parseMemory("2048") == 2048L * MiB)
    assert(ScaleConf.parseMemory("2048m") == 2048L * MiB)
    assert(ScaleConf.parseMemory("2g") == 2L * GiB)
    assert(ScaleConf.parseMemory("1.5G") == (1.5 * GiB).toLong)
    assert(ScaleConf.parseMemory("512K") == 512L << 10)
    assert(ScaleConf.parseMemory("4gb") == 4L * GiB)
    assert(ScaleConf.parseMemory("1t") == 1L << 40)
  }

  test("confEntries covers the four sizing knobs") {
    val s = ScaleConf.derive(10L * GiB, 32, 8 * GiB)
    val m = ScaleConf.confEntries(s).toMap
    assert(m.keySet == Set(
      "spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"))
    assert(m("spark.sql.shuffle.partitions").toInt == s.shufflePartitions)
  }
}
