package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch diagnosis main for the co-purchase pairSupport build (the
  * [[GraphDiag]] precedent): at sf10 the build's one fused stage costs
  * ~6000 executor-seconds for 157.5M pairs of which 99.996% are UNIQUE
  * — so both the dedup hash agg (67.4M unique (ok,pk) keys) and the
  * pair count's partial agg (157.5M unique (a,b) keys) achieve no
  * reduction and only pay hash-map costs. Times the candidate
  * sorted-streaming variants piece by piece. Drive with
  * `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 SPARK_GRAFT_AUTOSIZE=1
  * runMain graft.PairDiag`. */
object PairDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.get("SPARK_GRAFT_AUTOSIZE").contains("1")) {
      val sizing = ScaleConf.derive(ScaleConf.inputBytes(sfDir),
        totalCores = cpus.toInt,
        executorMemoryBytes = ScaleConf.executorMemoryBytes(s"local[$cpus]"))
      ScaleConf.confEntries(sizing).foreach { case (k, v) =>
        builder.config(k, v) }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables.lineitem(spark, sfDir)

    def time(n: String)(df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(n)
      df.write.format("noop").mode("overwrite").save()
      println(f"[pairdiag] $n%-34s ${(System.nanoTime() - t0) / 1e9}%7.1f s")
      spark.sparkContext.setJobDescription(null)
    }

    // ---- current form, decomposed ----
    val basketCur = li
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
      .repartition(col("ok"))
      .dropDuplicates("ok", "l_partkey")
    time("A1 dedup (hash agg)")(basketCur)
    val fanCur = basketCur.select(col("ok"), col("l_partkey").as("a"))
      .join(basketCur.select(col("ok"), col("l_partkey").as("b")), Seq("ok"))
      .filter(col("a") < col("b"))
    time("A2 dedup+join fan, 1-row sum")(
      fanCur.select((col("a") + col("b")).as("s")).agg(sum("s")))
    time("A3 current full pairSupport")(
      fanCur.groupBy("a", "b").agg(count(lit(1)).as("support")))

    // ---- sorted streaming dedup + SMJ fan ----
    val sorted = li
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .repartition(col("ok"))
      .sortWithinPartitions("ok", "pk")
    val wOk = Window.partitionBy("ok").orderBy("pk")
    val basketSorted = sorted
      .withColumn("prev", lag(col("pk"), 1).over(wOk))
      .filter(col("prev").isNull || col("prev") =!= col("pk"))
      .select(col("ok"), col("pk"))
    time("B1 sorted streaming dedup")(basketSorted)
    val fanB = basketSorted.select(col("ok"), col("pk").as("a"))
      .join(basketSorted.select(col("ok"), col("pk").as("b")), Seq("ok"))
      .filter(col("a") < col("b"))
    time("B2 sorted dedup + SMJ fan, sum")(
      fanB.select((col("a") + col("b")).as("s")).agg(sum("s")))
    time("B3 sorted fan + hash count")(
      fanB.groupBy("a", "b").agg(count(lit(1)).as("support")))
    val wPair = Window.partitionBy("a", "b")
    val wPairOrd = Window.partitionBy("a", "b").orderBy("a")
    time("B4 sorted fan + sort-window count")(
      fanB.repartition(col("a"), col("b"))
        .sortWithinPartitions("a", "b")
        .select(col("a"), col("b"),
          count(lit(1)).over(wPair).as("support"),
          row_number().over(wPairOrd).as("rn"))
        .filter(col("rn") === 1).drop("rn"))

    // ---- basket-array fan (no self-join): window collect_list + double explode ----
    val wOkFull = Window.partitionBy("ok").orderBy("pk")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val arrs = basketSorted
      .withColumn("arr", collect_list(col("pk")).over(wOkFull))
      .withColumn("rn", row_number().over(wOk))
      .filter(col("rn") === 1)
      .select(col("arr"))
    val fanC = arrs
      .select(posexplode(col("arr")).as(Seq("i", "a")), col("arr"))
      .select(col("a"),
        explode(slice(col("arr"), col("i") + lit(2),
          size(col("arr")) - col("i") - lit(1))).as("b"))
    time("C1 array fan, 1-row sum")(
      fanC.select((col("a") + col("b")).as("s")).agg(sum("s")))
    time("C2 array fan + hash count")(
      fanC.groupBy("a", "b").agg(count(lit(1)).as("support")))
    time("C3 array fan + sort-window count")(
      fanC.repartition(col("a"), col("b"))
        .sortWithinPartitions("a", "b")
        .select(col("a"), col("b"),
          count(lit(1)).over(wPair).as("support"),
          row_number().over(wPairOrd).as("rn"))
        .filter(col("rn") === 1).drop("rn"))

    // sanity: row counts + support>=2 counts must agree across forms
    val ref = fanCur.groupBy("a", "b").agg(count(lit(1)).as("support"))
    val c3 = fanC.repartition(col("a"), col("b"))
      .sortWithinPartitions("a", "b")
      .select(col("a"), col("b"),
        count(lit(1)).over(wPair).as("support"),
        row_number().over(wPairOrd).as("rn"))
      .filter(col("rn") === 1).drop("rn")
    val refN = ref.count(); val c3N = c3.count()
    val refS = ref.filter(col("support") >= 2).count()
    val c3S = c3.filter(col("support") >= 2).count()
    println(s"[pairdiag] rows ref=$refN c3=$c3N  support>=2 ref=$refS c3=$c3S")
    spark.stop()
  }
}
