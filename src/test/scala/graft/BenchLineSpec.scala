package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver captures only a bounded stdout tail (~1.9 KB): rounds 2
  * and 3 lost their whole bench artifact to a line that outgrew it
  * (`parsed:null`). This pins the budget against the CURRENT query
  * registry, with worst-case-width values, so adding queries past the
  * window fails the build instead of silently zeroing a round's bench.
  * (No SparkSession needed — the key set is `SparkEntry.queries.keys`.)
  */
class BenchLineSpec extends AnyFunSuite {

  test("bench stdout ARRAY line fits the driver's capture tail at worst-case widths (r10 form)") {
    val names = SparkEntry.queries.keys.toSeq
    // envelope: EVERY query at 4-digit centiseconds (≤ 99.99 s — forced
    // mode bills full materialization, so give each entry a digit more
    // headroom than the object-form test did) plus a 10-entry failed list
    val qv = names.map(_ => "9999").mkString("[", ",", "]")
    val failed = (0 until 10).map(_ => names.size - 1).mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":99999.999,"unit":"sec","qunit":"centisec","qorder":"sorted","force":1,"qv":$qv,"failed":$failed,"sf":"/root/testdata/sf0.1"}"""
    assert(line.length <= 1900,
      s"bench stdout array line is ${line.length} B for ${names.size} queries — " +
        "outgrowing the driver's ~1.9 KB stdout tail")
    // headroom statement: the array form must leave room for real
    // registry growth (the object form capped one round ahead at r9)
    assert(names.size <= 360,
      s"registry at ${names.size}: approaching the ~380-query array-form cap — " +
        "plan the next encoding change a round BEFORE the cap, not at it")
  }

  test("failure messages persist as valid JSON strings with root cause (r10 verdict #2)") {
    // quotes, backslashes, newlines, control chars must survive into
    // BENCH_FULL.json parseably; long messages are capped
    val escaped = Bench.jsonString("a \"quoted\" \\path\nline2\u0001")
    assert(escaped == "\"a \\\"quoted\\\" \\\\path\\nline2\\u0001\"")
    // the escaped literal round-trips through a JSON parser shape check:
    // no raw quote/backslash/control chars remain inside the literal
    val inner = escaped.drop(1).dropRight(1)
    assert(!inner.replaceAll("\\\\.", "").exists(c => c == '"' || c == '\\' || c < ' '))
    assert(Bench.jsonString("x" * 1000).length <= 400 + 7)
    assert(Bench.jsonString(null) == "\"null\"", "null message must not throw")
    // wrapped failures report the ROOT cause too (executor OOMs surface
    // wrapped in SparkException — the cause is the diagnosis)
    val root = new OutOfMemoryError("heap")
    val wrapped = new RuntimeException("stage failed", root)
    val d = Bench.describeFailure(wrapped)
    assert(d.contains("stage failed") && d.contains("OutOfMemoryError") &&
      d.contains("heap"), d)
    assert(Bench.describeFailure(root) == root.toString)
  }

  test("short keys are unique and legend-invertible") {
    val names = SparkEntry.queries.keys.toSeq
    val short = Bench.shortKeys(names)
    assert(short.values.toSet.size === names.size, "short-key collision")
    assert(short.keySet === names.toSet)
  }

  test("referenceTimes reads only same-sf queries and skips legend strings") {
    val json =
      """{
        |  "metric": "total", "value": 9.999, "unit": "sec",
        |  "ivf_build_sec": 1.234,
        |  "sf": "/root/testdata/sf0.1",
        |  "legend": {
        |    "sco": "scan_count",
        |    "acu": "agg_cube"
        |  },
        |  "queries": {
        |    "scan_count": 0.105,
        |    "agg_cube": 0.360,
        |    "broken_query": -1
        |  }
        |}
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("benchref", ".json")
    java.nio.file.Files.writeString(f, json)
    // the fixture has no "force" field = a pre-r10 count-mode artifact:
    // readable by a count-mode run, refused by a forced run (mode
    // mismatch would under-threshold every map-heavy query — r10 flip)
    val ref = Bench.referenceTimes(f.toString, "/root/testdata/sf0.1", force = false)
    // failed (-1) entries are excluded; top-level numbers and legend are not
    assert(ref === Map("scan_count" -> 0.105, "agg_cube" -> 0.360))
    assert(Bench.referenceTimes(f.toString, "/root/testdata/sf0.1", force = true)
      === Map.empty, "count-mode refs must not judge a forced run")
    val forcedJson = json.replace("\"sf\":", "\"force\": 1,\n  \"sf\":")
    val f2 = java.nio.file.Files.createTempFile("benchref2", ".json")
    java.nio.file.Files.writeString(f2, forcedJson)
    assert(Bench.referenceTimes(f2.toString, "/root/testdata/sf0.1", force = true)
      === Map("scan_count" -> 0.105, "agg_cube" -> 0.360))
    assert(Bench.referenceTimes(f2.toString, "/root/testdata/sf0.1", force = false)
      === Map.empty, "forced refs must not judge a count-mode run")
    java.nio.file.Files.delete(f2)
    // an sf mismatch (sf10 rehearsal vs sf0.1 refs) disables the ref set
    assert(Bench.referenceTimes(f.toString, "/root/testdata/sf10", force = false) === Map.empty)
    // absent file is not an error
    assert(Bench.referenceTimes("/nonexistent/ref.json", "x", force = false) === Map.empty)
    java.nio.file.Files.delete(f)
  }

  test("refDrift flags BOTH stale refs and refless registry queries (r8 #3)") {
    // the r8 committed artifact ran with a 160-entry reference against a
    // 162-query registry: the stale-direction warning existed, the
    // missing-direction one did not — both must fire
    val refs = Set("a", "b", "dead_query")
    val registry = Set("a", "b", "new_query_1", "new_query_2")
    val (stale, refless) = Bench.refDrift(refs, registry)
    assert(stale === Set("dead_query"))
    assert(refless === Set("new_query_1", "new_query_2"))
    val (stale2, refless2) = Bench.refDrift(registry, registry)
    assert(stale2.isEmpty && refless2.isEmpty)
  }

  test("calibrationRatio: median of measured/ref over the calibration set, None below quorum (r17, VERDICT r16 #4)") {
    // every calibration query must exist in the registry — a renamed or
    // dropped member silently shrinks the quorum until calibration
    // disables itself
    Bench.calibrationQueries.foreach { q =>
      assert(SparkEntry.queries.contains(q),
        s"calibration query $q is not in the registry")
    }
    val refs = Bench.calibrationQueries.map(_ -> 1.0).toMap
    // a uniformly 2x-slower box calibrates to exactly 2.0
    val slow = Bench.calibrationQueries.map(_ -> 2.0).toMap
    assert(Bench.calibrationRatio(slow, refs).contains(2.0))
    // the median ignores a single contended outlier (9 at 1.0, 1 at 50x)
    val spiky = Bench.calibrationQueries.zipWithIndex.map { case (q, i) =>
      q -> (if (i == 0) 50.0 else 1.0)
    }.toMap
    assert(Bench.calibrationRatio(spiky, refs).contains(1.0))
    // even-count median is the midpoint of the two central ratios
    val six = Bench.calibrationQueries.take(6).zipWithIndex.map {
      case (q, i) => q -> (i + 1.0)
    }.toMap
    assert(Bench.calibrationRatio(six, refs).contains(3.5))
    // below quorum (failures / missing refs / subset) -> None
    val three = Bench.calibrationQueries.take(3).map(_ -> 1.0).toMap
    assert(Bench.calibrationRatio(three, refs).isEmpty)
    // failed runs (-1) don't count toward quorum
    val failed = Bench.calibrationQueries.map(_ -> -1.0).toMap
    assert(Bench.calibrationRatio(failed, refs).isEmpty)
  }
}
