package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    def time(n: String)(f: => Long): Unit = { val t0=System.nanoTime(); val c=f; println(f"[prof] $n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$c") }
    // stage 1: shingles only
    val sh = docs.select(col("doc_id"), expr("filter(split(lower(text), ' '), t -> t != '')").as("toks"))
    time("tokenize")(sh.count())
    import graft.operators.DedupOps
    time("nearMinhash e2e")(DedupOps.nearMinhash(docs).count())
    time("nearMinhash again")(DedupOps.nearMinhash(docs).count())
    time("ngramJaccard e2e")(DedupOps.ngramJaccard(docs).count())
    time("ngramJaccard capped")(DedupOps.ngramJaccard(docs, maxDf = 3).count())
    time("jaccard clusters e2e")(DedupOps.clusters(DedupOps.ngramJaccard(docs)).count())
    time("simhashPairs e2e")(DedupOps.simhashPairs(docs).count())
    time("ngramStats e2e")(TextOps.ngramStats(docs).count())
    // interpreted→compiled delta for SimHash: the round-1 formulation ran
    // 64 interpreted `aggregate` HOF passes per document; the compiled
    // SimHash64Expr does one pass with 64 accumulators
    val toks = expr("filter(split(lower(text), ' '), t -> t != '')")
    val hashes = transform(toks, t => xxhash64(t))
    val bitCols = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1L << b)).otherwise(lit(0L))
    }
    time("simhash interpreted HOF")(
      docs.select(col("doc_id"), bitCols.reduce(_ + _).as("sh")).count())
    time("simhash compiled expr")(DedupOps.simhash(docs).count())
    spark.stop()
  }
}
