package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewAndIvfSpec extends SparkSpec {

  test("saltedJoin returns exactly the unsalted join result") {
    val ev = Tables.events(spark, sf()) // user_id is the (mildly) skewed key
      .select(col("event_id"), col("user_id"))
    val dim = Tables.customer(spark, sf())
      .select(col("c_custkey").as("user_id"), col("c_name"))
    val plain = ev.join(dim, "user_id")
      .select("event_id", "user_id", "c_name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(ev, dim, "user_id", salt = 4)
      .select("event_id", "user_id", "c_name")
      .collect().map(_.toString).sorted
    assert(plain.length > 0)
    assert(plain.sameElements(salted))
  }

  test("saltedCount matches plain groupBy count") {
    val ev = Tables.events(spark, sf())
    val plain = ev.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = Skew.saltedCount(ev, "user_id", salt = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(plain === salted)
  }

  test("saltedAsof equals asofEvent on the real tables") {
    val ev = Tables.events(spark, sf())
    val os = Tables.orders(spark, sf())
    val plain = Joins.asofEvent(ev, os)
      .collect().map(_.toString).toSeq
    val salted = Skew.saltedAsof(ev, os)
      .collect().map(_.toString).toSeq
    assert(plain.nonEmpty)
    assert(plain === salted)
  }

  test("saltedAsof spreads a hot user over >1 task and stitches boundaries") {
    val sess = spark
    import sess.implicits._
    // one bot user (id 1) holds 50% of all events, spread over 40 days;
    // a quiet user (id 2) holds the rest. Orders are sparse: user 1
    // orders on days 0 and 20 only — so most of user 1's events must
    // take their match from an EARLIER day sub-range (the stitch path).
    val day = 86400L
    val hotEvents = (0 until 400).map { i =>
      (1000L + i, 1L, new java.sql.Timestamp(((i % 40) * day + (i / 40) * 3600 + 1) * 1000L))
    }
    val coldEvents = (0 until 400).map { i =>
      (5000L + i, 2L, new java.sql.Timestamp(((i % 40) * day + (i / 40) * 3600 + 1) * 1000L))
    }
    val events = (hotEvents ++ coldEvents).toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (10L, 1L, new java.sql.Timestamp(0L)),
      (11L, 1L, new java.sql.Timestamp(20 * day * 1000L)),
      (12L, 2L, new java.sql.Timestamp(5 * day * 1000L))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")

    // correctness incl. boundary stitch: match the plain-plan result
    val plain = Joins.asofEvent(events, orders).collect().map(_.toString).toSeq
    val salted = Skew.saltedAsof(events, orders).collect().map(_.toString).toSeq
    assert(plain === salted)
    // an event on day 19 (no local order that day) must carry day 0's
    // order across 19 sub-range boundaries
    val day19 = Skew.saltedAsof(events, orders)
      .filter(col("event_id") === 1019L).collect().head
    assert(day19.getLong(2) === 0L)

    // skew spread: under the salted partitioning key (user, sub-range)
    // the hot user's rows land in >1 shuffle partition; under the plain
    // key (user) they collapse into one
    val withW = events.withColumn("__w", floor(unix_timestamp(col("ts")) / day))
    // explicit partition count: an un-numbered repartition is AQE-
    // coalescable and collapses this tiny fixture back into one partition
    val saltedPids = withW.repartition(4, col("user_id"), col("__w"))
      .select(col("user_id"), spark_partition_id().as("pid"))
      .filter(col("user_id") === 1L).select("pid").distinct().count()
    val plainPids = events.repartition(4, col("user_id"))
      .select(col("user_id"), spark_partition_id().as("pid"))
      .filter(col("user_id") === 1L).select("pid").distinct().count()
    assert(plainPids === 1L)
    assert(saltedPids > 1L,
      s"hot user still funnels through one task ($saltedPids partitions)")
  }

  test("distributedRowNumber equals the single-task global window") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf())
    val viaWindow = orders
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .select("o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val viaDistributed = Skew.distributedRowNumber(
      orders, 8, col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaWindow.size === viaDistributed.size)
    assert(viaWindow === viaDistributed)
  }

  test("distributedNtileDense equals the single-task global windows") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf())
    // o_totalprice has duplicate values across orderkeys, so value runs
    // straddle range-partition boundaries — exercising the dense-rank
    // boundary-merge correction; n=7 leaves a remainder (N mod 7 != 0)
    val viaWindow = orders
      .select(col("o_orderkey"),
        ntile(7).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))).as("tile"),
        dense_rank().over(Window.orderBy(col("o_totalprice").desc)).as("drank"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val viaDistributed = Skew.distributedNtileDense(
        orders, 8, 7, "o_totalprice", "o_orderkey")
      .select("o_orderkey", "tile", "drank")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(viaWindow.size === viaDistributed.size)
    assert(viaWindow === viaDistributed)
  }

  test("distributedNtileDense handles fewer rows than tiles (q=0 branch)") {
    import org.apache.spark.sql.expressions.Window
    val tiny = Tables.orders(spark, sf()).orderBy("o_orderkey").limit(3)
    val viaWindow = tiny
      .select(col("o_orderkey"),
        ntile(7).over(Window.orderBy(col("o_totalprice"), col("o_orderkey"))).as("tile"),
        dense_rank().over(Window.orderBy(col("o_totalprice").desc)).as("drank"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    val viaDistributed = Skew.distributedNtileDense(
        tiny, 4, 7, "o_totalprice", "o_orderkey")
      .select("o_orderkey", "tile", "drank")
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    assert(viaWindow === viaDistributed)
  }

  test("sim_ann_ivf recall@10 vs exact brute force") {
    val emb = Tables.embeddings(spark, sf())
    val exact = VectorOps.cosineTopK(emb, probeId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val approx = VectorOps.annIvf(emb, probeId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall")
  }

  test("sim_ann_ivf_batch: per-probe recall vs the exact batch baseline") {
    val emb = Tables.embeddings(spark, sf())
    def byProbe(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).toSet }
    val exact = byProbe(VectorOps.batchCosineTopK(emb, nProbes = 5, k = 10).collect())
    val approx = byProbe(VectorOps.annIvfBatch(emb, nProbes = 5, k = 10).collect())
    assert(approx.keySet === exact.keySet, "every probe must return results")
    val recalls = exact.map { case (p, ex) =>
      (ex intersect approx(p)).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 = $mean (${recalls.toSeq.sorted})")
    // single-probe path and batch path agree on the shared probe 0
    val single = VectorOps.annIvf(emb, probeId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(approx(0L) === single)
  }

  test("IVF cache rebuilds when the corpus is overwritten in place") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-stale")
      .toFile.getAbsolutePath
    val sess = spark
    import sess.implicits._
    def mk(ids: Seq[Long]) = ids.map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 31 + d).toFloat))
    }.toDF("vec_id", "embedding")
    mk(0L until 32L)
      .write.mode("overwrite").parquet(dir)
    val r1 = VectorOps.annIvf(spark.read.parquet(dir), probeId = 0L, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(r1.nonEmpty && r1.forall(_ < 100L))
    // same path, new data: the snapshot component of the cache key must
    // miss, so the probe sees ONLY new vec_ids — a stale index would
    // return ids from the first corpus
    mk(100L until 132L)
      .write.mode("overwrite").parquet(dir)
    val r2 = VectorOps.annIvf(spark.read.parquet(dir), probeId = 100L, k = 5)
      .collect().map(_.getLong(0)).toSet
    assert(r2.nonEmpty && r2.forall(_ >= 100L), s"stale index served: $r2")
  }
}
