package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps
import graft.sources.InMemoryBus

/** `DedupOps.spanRewriteStream` (round-13 deferred #2): the streaming
  * twin of the batch span-rewrite dedup. Three pins:
  *
  *  1. STATIC equivalence: on a batch frame every state group starts
  *     empty, so the kept-span set reassembles to EXACTLY the batch
  *     `spanRewrite` output (all six columns, rewrite_md5 included) —
  *     the two forms are one semantics in two execution modes.
  *  2. In-runner composition + resume: the operator runs INSIDE the bus
  *     runner's transform slot; a second pipeline instance on the same
  *     checkpoint suppresses spans first seen in wave 1 (restored
  *     state, not batch-local dedup) while passing fresh spans.
  *  3. Within-batch determinism: a span shared by two docs in one wave
  *     is claimed by the (doc_id, block_idx)-minimum instance.
  */
class StreamingSpanRewriteSpec extends SparkSpec {

  private def reassembleAndCompare(kept: org.apache.spark.sql.DataFrame,
                                   docs: org.apache.spark.sql.DataFrame,
                                   label: String): Unit = {
    val batch = DedupOps.spanRewrite(docs)
      .collect().map(_.toString).toSet
    val reassembled = kept
      .groupBy("doc_id")
      .agg(
        max(col("lang")).as("lang"),
        max(col("n_spans")).as("n_spans"),
        count(lit(1)).as("n_kept"),
        sum(size(split(col("span"), " ")).cast("long")).as("kept_words"),
        md5(array_join(
          transform(
            array_sort(collect_list(struct(col("block_idx"), col("span")))),
            s => s.getField("span")),
          " ")).as("rewrite_md5"))
      .select("doc_id", "lang", "n_spans", "n_kept", "kept_words",
        "rewrite_md5")
      .collect().map(_.toString).toSet
    assert(reassembled == batch,
      s"$label on a static frame must equal the batch rewrite " +
        s"(batch ${batch.size} docs, reassembled ${reassembled.size})")
  }

  test("static mode: kept spans reassemble to the batch spanRewrite output") {
    val docs = Tables.documents(spark, sf())
    reassembleAndCompare(DedupOps.spanRewriteStream(docs).toDF(), docs,
      "fMGWS streaming twin")
  }

  test("static mode (transformWithState): the TWS form equals the batch rewrite too") {
    // batch-mode TWS still materializes a real state store: run it on a
    // cloned session pinned to RocksDB (the provider TWS requires)
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // batch TWS loads state stores on executors, which look up the
    // driver's StateStoreCoordinator RPC endpoint — an endpoint only a
    // STREAMING stateful query registers. Depending on suite order no
    // stream may have run yet in this JVM, so bootstrap it with a
    // one-batch stateful no-op stream (deterministic, ~1 s).
    val boot = s.readStream.format("rate").option("rowsPerSecond", "1")
      .load().dropDuplicates("value")
      .writeStream.format("noop")
      .option("checkpointLocation",
        Files.createTempDirectory("tws-boot-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    boot.awaitTermination(30000)
    val docs = Tables.documents(s, sf())
    reassembleAndCompare(DedupOps.spanRewriteStreamTws(docs).toDF(), docs,
      "transformWithState twin")
  }

  /** The fMGWS stop/resume contract, parameterized by session so the
    * default-provider and RocksDB-provider variants (r18, VERDICT r17
    * #5) run the IDENTICAL waves/assertions. */
  private def fmgwsStopResume(
      s: org.apache.spark.sql.SparkSession, tag: String): Unit = {
    val id = java.util.UUID.randomUUID().toString.take(8)
    val inTopic = s"spanrw-$tag-in-$id"; val inSub = s"spanrw-$tag-insub-$id"
    val outTopic = s"spanrw-$tag-out-$id"; val outSub = s"spanrw-$tag-outsub-$id"
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string").add("lang", "string")
    val ckpt = Files.createTempDirectory(s"spanrw-$tag-ckpt").toString
    def mkPipeline() = new Pipeline(s, inSub, outTopic,
      JsonSerde(schema),
      transform = df => DedupOps.spanRewriteStream(
        df.select(col("payload.doc_id").as("doc_id"),
          col("payload.text").as("text"),
          col("payload.lang").as("lang")),
        k = 3).toDF(),
      checkpointDir = ckpt)
    def doc(i: Long, text: String) =
      s"""{"doc_id":$i,"text":"$text","lang":"en"}"""
    val outSchema = new StructType()
      .add("doc_id", "long").add("lang", "string").add("n_spans", "long")
      .add("block_idx", "int").add("span", "string")
    def outSpans(): Seq[(Long, Int, String)] = InMemoryBus.payloads(outSub)
      .map(b => new String(b, "UTF-8"))
      .map { j =>
        val r = spark.range(1)
          .select(from_json(lit(j), outSchema).as("p"))
          .select(col("p.doc_id"), col("p.block_idx"), col("p.span")).head()
        (r.getLong(0), r.getInt(1), r.getString(2))
      }

    // wave 1: doc 1 has two spans; doc 2 repeats doc 1's FIRST span
    // (in-batch tie → doc 1 wins) and adds a fresh one
    Seq(doc(1, "alpha beta gamma delta epsilon zeta"),
        doc(2, "alpha beta gamma eta theta iota"))
      .foreach(m => InMemoryBus.publish(inTopic, m.getBytes("UTF-8")))
    val q1 = mkPipeline().start(availableNow = true)
    q1.awaitTermination(60000)
    val run1 = outSpans()
    assert(run1.toSet == Set(
      (1L, 0, "alpha beta gamma"),
      (1L, 1, "delta epsilon zeta"),
      (2L, 1, "eta theta iota")),
      s"wave 1 ($tag): doc 1 must claim the shared span, doc 2 keeps " +
        s"only its fresh span: $run1")

    // wave 2, NEW pipeline on the SAME checkpoint: doc 3 is an exact
    // duplicate of doc 1 (every span must die on RESTORED state — the
    // doc vanishes); doc 4 brings one fresh span
    Seq(doc(3, "alpha beta gamma delta epsilon zeta"),
        doc(4, "kappa lambda mu"))
      .foreach(m => InMemoryBus.publish(inTopic, m.getBytes("UTF-8")))
    val q2 = mkPipeline().start(availableNow = true)
    q2.awaitTermination(60000)
    val run2 = outSpans().drop(run1.size)
    assert(run2 == Seq((4L, 0, "kappa lambda mu")),
      s"restored span state ($tag) must erase the wave-2 duplicate doc " +
        s"and pass the fresh span: $run2")
    val stateRows = q2.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsTotal)
    assert(stateRows.nonEmpty && stateRows.max == 4L,
      s"state ($tag) must hold the 4 distinct spans ever seen (3 " +
        s"restored + 1 new): $stateRows")
  }

  test("bus runner: span state survives checkpoint stop/resume; in-batch ties go to min (doc_id, block_idx)") {
    fmgwsStopResume(spark, "hdfs")
  }

  test("bus runner under RocksDB: the fMGWS gate's stop/resume contract holds on the corpus-scale provider (r18)") {
    // the scaladoc's "RocksDB state-store territory at corpus scale"
    // claim, executed: same waves, same assertions, provider swapped on
    // a cloned session (VERDICT r17 #5)
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    fmgwsStopResume(s, "rocks")
  }

  test("transformWithState twin: span state survives checkpoint stop/resume on RocksDB") {
    // the TWS form hard-requires the RocksDB state store; conf set on a
    // CLONED session so the shared spec session stays on the default
    // provider (fMGWS tests above keep proving the default-provider path)
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val id = java.util.UUID.randomUUID().toString.take(8)
    val inTopic = s"spanrwt-in-$id"; val inSub = s"spanrwt-insub-$id"
    val outTopic = s"spanrwt-out-$id"; val outSub = s"spanrwt-outsub-$id"
    InMemoryBus.createTopic(inTopic); InMemoryBus.createSubscription(inTopic, inSub)
    InMemoryBus.createTopic(outTopic); InMemoryBus.createSubscription(outTopic, outSub)
    val schema = new StructType()
      .add("doc_id", "long").add("text", "string").add("lang", "string")
    val ckpt = Files.createTempDirectory("spanrwt-ckpt").toString
    def mkPipeline() = new Pipeline(s, inSub, outTopic,
      JsonSerde(schema),
      transform = df => DedupOps.spanRewriteStreamTws(
        df.select(col("payload.doc_id").as("doc_id"),
          col("payload.text").as("text"),
          col("payload.lang").as("lang")),
        k = 3).toDF(),
      checkpointDir = ckpt)
    def doc(i: Long, text: String) =
      s"""{"doc_id":$i,"text":"$text","lang":"en"}"""
    val outSchema = new StructType()
      .add("doc_id", "long").add("lang", "string").add("n_spans", "long")
      .add("block_idx", "int").add("span", "string")
    def outSpans(): Seq[(Long, Int, String)] = InMemoryBus.payloads(outSub)
      .map(b => new String(b, "UTF-8"))
      .map { j =>
        val r = spark.range(1)
          .select(from_json(lit(j), outSchema).as("p"))
          .select(col("p.doc_id"), col("p.block_idx"), col("p.span")).head()
        (r.getLong(0), r.getInt(1), r.getString(2))
      }

    Seq(doc(1, "alpha beta gamma delta epsilon zeta"),
        doc(2, "alpha beta gamma eta theta iota"))
      .foreach(m => InMemoryBus.publish(inTopic, m.getBytes("UTF-8")))
    val q1 = mkPipeline().start(availableNow = true)
    q1.awaitTermination(60000)
    val run1 = outSpans()
    assert(run1.toSet == Set(
      (1L, 0, "alpha beta gamma"),
      (1L, 1, "delta epsilon zeta"),
      (2L, 1, "eta theta iota")),
      s"TWS wave 1: doc 1 must claim the shared span: $run1")

    // wave 2 on the SAME checkpoint: a duplicate doc dies on RESTORED
    // RocksDB state, a fresh span passes
    Seq(doc(3, "alpha beta gamma delta epsilon zeta"),
        doc(4, "kappa lambda mu"))
      .foreach(m => InMemoryBus.publish(inTopic, m.getBytes("UTF-8")))
    val q2 = mkPipeline().start(availableNow = true)
    q2.awaitTermination(60000)
    val run2 = outSpans().drop(run1.size)
    assert(run2 == Seq((4L, 0, "kappa lambda mu")),
      s"TWS restored span state must erase the wave-2 duplicate: $run2")
  }
}
