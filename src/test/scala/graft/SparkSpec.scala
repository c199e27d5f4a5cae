package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // SPARK_GRAFT_TEST_MASTER=local-cluster[2,2,1024] runs the suites
    // against real executor JVMs (serialization + network shuffle).
    // The streaming suites are excluded in that mode: InMemoryBus is a
    // documented single-JVM test double (see InMemoryBus scaladoc) —
    // its statics don't span executor processes.
    val master = sys.env.getOrElse("SPARK_GRAFT_TEST_MASTER", "local[4]")
    val builder = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (master.startsWith("local-cluster")) {
      builder.config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes:/root/repo/target/scala-2.13/test-classes")
    }
    builder.getOrCreate()
  }
}
