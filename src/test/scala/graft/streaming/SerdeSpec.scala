package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test (SURVEY §5.2-3): `deserialize ∘ serialize = id` on
  * generated nested payloads — the generalization of the reference's
  * payload-integrity assert (`test_pubsub_pipeline.py:60-61`) over its
  * single fixture (`FIXTURES.md` §1). Uses ScalaCheck generators with a
  * fixed seed (deterministic CI) driven from a plain ScalaTest loop.
  */
class SerdeSpec extends SparkSpec {

  private val schema = new StructType()
    .add("data", "string")
    .add("n", "long")
    .add("flag", "boolean")
    .add("xs", "array<long>")
    .add("nested", new StructType().add("nestedData", "string").add("depth", "long"))

  private val genPayload: Gen[(String, Long, Boolean, Seq[Long], (String, Long))] =
    for {
      s <- Gen.alphaNumStr.map(_.take(40))
      n <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
      b <- Gen.oneOf(true, false)
      xs <- Gen.listOfN(3, Gen.chooseNum(-1000000L, 1000000L))
      ns <- Gen.alphaNumStr.map(_.take(20))
      d <- Gen.chooseNum(0L, 99L)
    } yield (s, n, b, xs, (ns, d))

  test("JsonSerde round-trips arbitrary nested payloads") {
    val serde = JsonSerde(schema)
    val sess = spark
    import sess.implicits._
    val rows = Gen.listOfN(200, genPayload)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator produced no sample"))
    val df = rows.toDF("data", "n", "flag", "xs", "nested")
      // align tuple field names with the serde schema
      .withColumn("nested", struct(col("nested._1").as("nestedData"),
        col("nested._2").as("depth")))
    val bytes = df.select(
      serde.serialize(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
    // serialize ∘ deserialize ∘ serialize = serialize (JSON fixed point):
    // field order comes from the schema both times, so byte equality holds
    val again = bytes
      .select(serde.deserialize(col("value")).as("payload"))
      .select(serde.serialize(col("payload")).as("value"))
    val a = bytes.collect().map(r => new String(r.getAs[Array[Byte]](0))).sorted
    val b = again.collect().map(r => new String(r.getAs[Array[Byte]](0))).sorted
    assert(a.length === 200)
    assert(a.sameElements(b))
  }
}
