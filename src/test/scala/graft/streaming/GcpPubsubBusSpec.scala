package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._
import graft.sources.InMemoryBus.TransientPullError

/** [[GcpPubsubBus]] contract tests (r13 verdict #4 — the real-GCP
  * adapter seam): the google-cloud-pubsub client jar cannot resolve in
  * a zero-egress build, so the adapter is exercised against MOCKED
  * client interfaces — the reference's own test strategy
  * (`test_pubsub_pipeline.py:48-52` hands the pipeline mock
  * subscriber/publisher clients). [[FakeGcpPubsub]] models the service
  * semantics the adapter depends on: per-message ack deadlines,
  * unacked redelivery with FRESH ack-ids, acknowledge-forgets,
  * modifyAckDeadline(0) = nack.
  */
class GcpPubsubBusSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session

  /** In-memory Pub/Sub service double behind the client API shape. */
  final class FakeGcpPubsub extends PubsubSubscriberApi with PubsubPublisherApi {
    final case class Stored(messageId: String, data: Array[Byte],
                            attributes: Map[String, String]) {
      var outstandingAckId: String = null // null = deliverable
      var acked: Boolean = false
    }
    private var idSeq = 0L
    private var ackSeq = 0L
    val topics = mutable.Map.empty[String, mutable.ArrayBuffer[Stored]]
    val subs = mutable.Map.empty[String, String] // subPath -> topicPath
    val modifyCalls = mutable.ArrayBuffer.empty[(Seq[String], Int)]
    var failNextPullWithDeadline = 0

    def createTopic(path: String): Unit =
      topics.getOrElseUpdate(path, mutable.ArrayBuffer.empty)
    def createSubscription(topicPath: String, subPath: String): Unit =
      subs(subPath) = topicPath

    override def publish(topicPath: String, data: Array[Byte],
                         attributes: Map[String, String]): String =
      synchronized {
        idSeq += 1
        val id = s"mid-$idSeq"
        topics.getOrElseUpdate(topicPath, mutable.ArrayBuffer.empty) +=
          Stored(id, data, attributes)
        id
      }

    override def pull(subPath: String,
                      maxMessages: Int): Seq[PubsubReceived] = synchronized {
      if (failNextPullWithDeadline > 0) {
        failNextPullWithDeadline -= 1
        throw new PubsubDeadlineExceeded("deadline exceeded on pull")
      }
      val log = topics(subs(subPath))
      log.iterator.filter(m => !m.acked && m.outstandingAckId == null)
        .take(maxMessages).map { m =>
          ackSeq += 1
          m.outstandingAckId = s"ack-$ackSeq"
          PubsubReceived(m.outstandingAckId, m.messageId, m.data, m.attributes)
        }.toSeq
    }

    override def acknowledge(subPath: String,
                             ackIds: Seq[String]): Unit = synchronized {
      val ids = ackIds.toSet
      topics(subs(subPath)).foreach { m =>
        if (m.outstandingAckId != null && ids(m.outstandingAckId))
          m.acked = true
      }
    }

    override def modifyAckDeadline(subPath: String, ackIds: Seq[String],
                                   deadlineSeconds: Int): Unit = synchronized {
      modifyCalls += ((ackIds, deadlineSeconds))
      if (deadlineSeconds == 0) { // nack: immediate redelivery
        val ids = ackIds.toSet
        topics(subs(subPath)).foreach { m =>
          if (m.outstandingAckId != null && ids(m.outstandingAckId))
            m.outstandingAckId = null
        }
      }
    }

    /** The service-side deadline expiry: every outstanding un-acked
      * message becomes deliverable again (a later pull hands out a
      * FRESH ack-id) — forced explicitly so no test sleeps. */
    def expireOutstanding(): Unit = synchronized {
      topics.values.foreach(_.foreach { m =>
        if (!m.acked) m.outstandingAckId = null
      })
    }

    def ackedCount(topicPath: String): Int =
      synchronized { topics(topicPath).count(_.acked) }
    def payloadsOf(topicPath: String): Seq[String] =
      synchronized { topics(topicPath).map(m => new String(m.data, UTF_8)).toSeq }
  }

  private def freshFake(topic: String, sub: String): FakeGcpPubsub = {
    val fake = new FakeGcpPubsub
    fake.createTopic(s"projects/p/topics/$topic")
    fake.createSubscription(s"projects/p/topics/$topic",
      s"projects/p/subscriptions/$sub")
    fake
  }

  test("pull -> read -> advancing commit acks exactly the committed prefix") {
    val fake = freshFake("t", "s")
    val bus = new GcpPubsubBus("p", fake, fake)
    (1 to 5).foreach(i => bus.publish("t", s"m$i".getBytes(UTF_8)))
    val end = bus.endOffset("s")
    assert(end == 5L && bus.committedOffset("s") == 0L)
    val got = bus.read("s", 0, 5).map(m => new String(m.data, UTF_8))
    assert(got == (1 to 5).map(i => s"m$i"))
    // a range is re-readable (the DSv2 planner may read twice)
    assert(bus.read("s", 2, 4).map(m => new String(m.data, UTF_8)) ==
      Seq("m3", "m4"))
    bus.commit("s", 3)
    assert(bus.committedOffset("s") == 3L)
    assert(fake.ackedCount("projects/p/topics/t") == 3)
    // stale commit: no further acks, offset unmoved
    bus.commit("s", 2)
    assert(bus.committedOffset("s") == 3L)
    assert(fake.ackedCount("projects/p/topics/t") == 3)
    // reading below the ack frontier must fail loudly, not garble
    intercept[IllegalArgumentException](bus.read("s", 0, 5))
    bus.commit("s", 5)
    assert(fake.ackedCount("projects/p/topics/t") == 5)
  }

  test("service-side deadline expiry redelivers with a fresh ack-id; the buffer swaps, never duplicates") {
    val fake = freshFake("t", "s")
    val bus = new GcpPubsubBus("p", fake, fake)
    (1 to 3).foreach(i => bus.publish("t", s"m$i".getBytes(UTF_8)))
    assert(bus.endOffset("s") == 3L)
    fake.expireOutstanding() // holder stalled past its deadline
    // next planning poll re-pulls the SAME messages (fresh ack-ids):
    // offsets must not grow — the redelivered twin replaces the stale one
    assert(bus.endOffset("s") == 3L,
      "redelivered messages duplicated local offsets")
    bus.commit("s", 3)
    assert(fake.ackedCount("projects/p/topics/t") == 3,
      "commit acked stale ack-ids — the fresh tokens must be used")
  }

  test("lease maps onto modifyAckDeadline over outstanding ack-ids; nack sends 0") {
    val fake = freshFake("t", "s")
    val bus = new GcpPubsubBus("p", fake, fake)
    (1 to 4).foreach(i => bus.publish("t", s"m$i".getBytes(UTF_8)))
    bus.endOffset("s")
    val deadline = bus.nowMicros() + 30000000L // +30 s
    assert(bus.acquireLease("s", "A", deadline))
    val extend = fake.modifyCalls.last
    assert(extend._1.size == 4 && extend._2 >= 29 && extend._2 <= 31,
      s"acquire must extend all outstanding ack deadlines, got $extend")
    // a competing holder is refused locally — no API call for it
    assert(!bus.acquireLease("s", "B", deadline))
    // heartbeat extension goes through the same verb
    assert(bus.modifyAckDeadline("s", "A", bus.nowMicros() + 60000000L))
    assert(fake.modifyCalls.last._2 >= 59)
    // nack shape: deadline <= now -> modifyAckDeadline(0), lease released
    assert(bus.modifyAckDeadline("s", "A", bus.nowMicros()))
    assert(fake.modifyCalls.last._2 == 0)
    assert(bus.acquireLease("s", "B", bus.nowMicros() + 1000000L))
  }

  test("pull DeadlineExceeded surfaces as TransientPullError (the source's retry class)") {
    val fake = freshFake("t", "s")
    val bus = new GcpPubsubBus("p", fake, fake)
    bus.publish("t", "m1".getBytes(UTF_8))
    fake.failNextPullWithDeadline = 1
    intercept[TransientPullError](bus.endOffset("s"))
    assert(bus.endOffset("s") == 1L) // retry drains normally
  }

  test("publishIdempotent carries the key as an attribute (consumer-side dedup hook)") {
    val fake = freshFake("t", "s")
    val bus = new GcpPubsubBus("p", fake, fake)
    assert(bus.publishIdempotent("t", "k1", "d".getBytes(UTF_8)))
    val stored = fake.topics("projects/p/topics/t").head
    assert(stored.attributes.get("graft-idem-key").contains("k1"))
  }

  test("end-to-end: the Pipeline runner streams off a BusFactories-registered GCP adapter, ack-on-publish-success") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.StructType
    val fake = freshFake("in", "sub")
    fake.createTopic("projects/p/topics/out")
    BusFactories.register("gcpfake",
      spec => new GcpPubsubBus(spec.stripPrefix("gcpfake://"), fake, fake,
        pullBatch = 100))
    try {
      val busSpec = "gcpfake://p"
      val bus = BusRegistry.resolve(busSpec)
      (1 to 30).foreach(i =>
        bus.publish("in", s"""{"v":"m$i"}""".getBytes(UTF_8)))
      // the reference loop (pull -> deserialize -> process -> serialize
      // -> publish -> ack) over the GCP adapter, unchanged runner code
      val q = new Pipeline(
        spark, "sub", "out", JsonSerde(new StructType().add("v", "string")),
        df => df.select(col("payload.*"))
          .withColumn("v", concat(lit("processed:"), col("v"))),
        Files.createTempDirectory("graft-gcp-ckpt").toString,
        bulkLimit = 100, busSpec = busSpec).start(availableNow = true)
      q.awaitTermination(60000)
      assert(fake.payloadsOf("projects/p/topics/out").sorted ==
        (1 to 30).map(i => s"""{"v":"processed:m$i"}""").sorted)
      // the ack listener fires on QueryProgress, async wrt termination
      val t0 = System.currentTimeMillis
      while (fake.ackedCount("projects/p/topics/in") < 30 &&
        System.currentTimeMillis - t0 < 10000) Thread.sleep(50)
      assert(fake.ackedCount("projects/p/topics/in") == 30,
        "every processed message must be acked after a successful publish")
    } finally BusFactories.unregister("gcpfake")
  }
}
