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
}
