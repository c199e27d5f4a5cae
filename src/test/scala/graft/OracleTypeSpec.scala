package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-side mirror of ContractSpec's top-level DECIMAL ban (r14 VERDICT
  * #2): the driver's correctness hash is representation-sensitive, so an
  * oracle column DuckDB types as HUGEINT/UHUGEINT/DECIMAL hash-differs from
  * Spark's BIGINT/DOUBLE even when every value agrees (r14's two reds —
  * `SUM(BIGINT)` is HUGEINT in DuckDB).
  *
  * DuckDB cannot run in-JVM (no extra deps allowed), so this spec dumps
  * `oracle_sql.json` via Verify's writer and shells out to
  * `tools/audit_oracle_types.py`, which only DESCRIBEs each query (no row
  * fetch — seconds, not minutes). If python3/duckdb is absent the test
  * CANCELS (visible, not silently green) — the same audit still runs in
  * tools/check_oracle.py ahead of every local gate replica.
  */
class OracleTypeSpec extends AnyFunSuite with SparkSpec {

  private def sfDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

  test("no oracle SQL emits a top-level HUGEINT/UHUGEINT/DECIMAL column") {
    import scala.sys.process._
    val haveDuck = try {
      Seq("python3", "-c", "import duckdb").!(ProcessLogger(_ => ())) == 0
    } catch { case _: Throwable => false }
    assume(haveDuck, "python3+duckdb unavailable — audit runs via tools/check_oracle.py instead")
    val tmp = java.nio.file.Files.createTempDirectory("oracle-types").toString
    // dynamic (fitted-parameter) oracles audit too — built against the
    // spec corpus; their output types are corpus-independent
    Verify.writeOracleJson(tmp, SparkEntry.dynamicOracleSql(spark, sfDir))
    val out = new StringBuilder
    val code = Seq("python3", "tools/audit_oracle_types.py", sfDir,
      s"$tmp/oracle_sql.json").!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"banned oracle output types:\n$out")
  }
}
