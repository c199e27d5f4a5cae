package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

/** In-memory Pub/Sub-shaped message bus (SURVEY §7 M5).
  *
  * Models the subset of Pub/Sub the reference touches: topics,
  * subscriptions, opaque byte payloads with ack handles, at-least-once
  * redelivery of unacked messages (`pubsub_pipeline.py:177,179,31-52`).
  * Zero-egress: this is the test double for the real service; the DSv2
  * connector (`BusProvider`) is the production-shaped integration point.
  *
  * Semantics:
  *  - `publish(topic, ...)` appends to every subscription of the topic
  *    (fan-out, like Pub/Sub).
  *  - A subscription is an ordered log + a committed (acked) prefix.
  *    `commit(sub, n)` acks everything below offset n — the streaming
  *    source calls it only after the sink epoch is durable, which is the
  *    reference's ack-on-publish-success (`pubsub_pipeline.py:82-84`)
  *    strengthened by the checkpoint WAL (SURVEY §3.4).
  *  - Messages above the committed prefix are redelivered on restart
  *    (at-least-once; duplicates possible, same as the reference §2-D).
  *  - `failNextPulls(sub, n)` injects transient pull failures to exercise
  *    the retry contract (`pubsub_pipeline.py:204-211`, test 3 in
  *    `test_pubsub_pipeline.py:107-143`).
  *
  * JVM-singleton state: fine for local[*] (driver and executors share the
  * JVM); a multi-node deployment would talk to the real service instead —
  * the connector code is identical either way.
  */
object InMemoryBus {

  final case class BusMessage(
      data: Array[Byte],
      messageId: String,
      publishTimeMicros: Long,
      attributes: Map[String, String])

  /** Transient, retryable pull failure (models DeadlineExceeded). */
  final class TransientPullError(msg: String) extends RuntimeException(msg)

  /** Lost ack RPC (models the reference's bare-except swallow window,
    * `pubsub_pipeline.py:48-52`: publish succeeded, ack never landed). */
  final class AckRpcError(msg: String) extends RuntimeException(msg)

  private final class Subscription(val topic: String, val name: String) {
    val log = new ArrayBuffer[BusMessage]()
    var committed: Long = 0L
    var failPulls: Int = 0
    var capPulls: Int = 0
    var capPerPull: Long = Long.MaxValue
    var failCommits: Int = 0
  }

  /** Non-transient publish failure (models a failed publish future —
    * `test_pubsub_pipeline.py:87-104`'s contract: no ack on publish fail). */
  final class PublishError(msg: String) extends RuntimeException(msg)

  private val topics = new ConcurrentHashMap[String, ArrayBuffer[Subscription]]()
  private val failPublishes = new ConcurrentHashMap[String, Integer]()
  private val publishGrace = new ConcurrentHashMap[String, Integer]()
  private val subs = new ConcurrentHashMap[String, Subscription]()
  private val idGen = new java.util.concurrent.atomic.AtomicLong(0L)
  // Deterministic logical clock for publishTime (no wall clock in tests).
  private val clock = new java.util.concurrent.atomic.AtomicLong(1704067200000000L)

  def createTopic(topic: String): Unit = synchronized {
    topics.putIfAbsent(topic, new ArrayBuffer[Subscription]())
  }

  def createSubscription(topic: String, name: String): Unit = synchronized {
    createTopic(topic)
    if (!subs.containsKey(name)) {
      val s = new Subscription(topic, name)
      subs.put(name, s)
      topics.get(topic) += s
    }
  }

  private val publishedKeys = new ConcurrentHashMap[String, java.util.HashSet[String]]()

  def publish(topic: String, data: Array[Byte],
              attributes: Map[String, String] = Map.empty): String = synchronized {
    createTopic(topic)
    val grace = publishGrace.getOrDefault(topic, 0)
    if (grace > 0) publishGrace.put(topic, grace - 1)
    else {
      val remaining = failPublishes.getOrDefault(topic, 0)
      if (remaining > 0) {
        failPublishes.put(topic, remaining - 1)
        throw new PublishError(s"injected publish failure on $topic")
      }
    }
    val id = s"m-${idGen.incrementAndGet()}"
    val msg = BusMessage(data, id, clock.addAndGet(1000L), attributes)
    topics.get(topic).foreach(_.log += msg)
    id
  }

  private def sub(name: String): Subscription = {
    val s = subs.get(name)
    require(s != null, s"no such subscription: $name")
    s
  }

  /** Current end offset (exclusive) of a subscription's log. */
  def endOffset(name: String): Long = synchronized {
    val s = sub(name)
    if (s.failPulls > 0) {
      s.failPulls -= 1
      throw new TransientPullError(s"injected deadline-exceeded on $name")
    }
    if (s.capPulls > 0) {
      // partial pull: the service under-reports the backlog — fewer
      // messages come back than are available (real Pub/Sub does this
      // routinely; a correct client must keep pulling, not assume drained)
      s.capPulls -= 1
      math.min(s.log.size.toLong, s.committed + s.capPerPull)
    } else s.log.size.toLong
  }

  /** Committed (acked) prefix offset. */
  def committedOffset(name: String): Long = synchronized { sub(name).committed }

  /** Read log slice [from, until). */
  def read(name: String, from: Long, until: Long): Seq[BusMessage] = synchronized {
    sub(name).log.slice(from.toInt, until.toInt).toSeq
  }

  /** Ack every message below `upTo` (idempotent, monotone). */
  def commit(name: String, upTo: Long): Unit = synchronized {
    val s = sub(name)
    if (s.failCommits > 0) {
      s.failCommits -= 1
      throw new AckRpcError(s"injected ack-RPC loss on $name")
    }
    s.committed = math.max(s.committed, upTo)
  }

  /** Inject `times` partial pulls: the next `times` backlog reads report
    * at most `maxPerPull` messages past the acked prefix even when more
    * are available (test hook, models a service-side partial response). */
  def capNextPulls(name: String, maxPerPull: Long, times: Int): Unit = synchronized {
    val s = sub(name)
    s.capPerPull = maxPerPull
    s.capPulls = times
  }

  /** Inject `n` ack-RPC failures: publish succeeded, the ack never lands —
    * the reference's silent-swallow window (`pubsub_pipeline.py:48-52`).
    * Because acks here are CUMULATIVE (monotone prefix), any later
    * successful ack heals the lost one. */
  def failNextCommits(name: String, n: Int): Unit = synchronized {
    sub(name).failCommits = n
  }

  /** Test support: rewind a subscription's acked prefix — models "publish
    * succeeded but the ack RPC was lost" (the reference's bare-except
    * swallow, `pubsub_pipeline.py:48-52`, SURVEY §2-D), which is the real
    * at-least-once duplicate window. */
  def rewindCommitted(name: String, to: Long): Unit = synchronized {
    sub(name).committed = to
  }

  /** Inject `n` transient pull failures (test hook, models the
    * DeadlineExceeded retry path). */
  def failNextPulls(name: String, n: Int): Unit = synchronized {
    sub(name).failPulls = n
  }

  /** Idempotent publish: a (topic, key) pair is published at most once —
    * replays of an already-delivered batch are absorbed. This is the
    * standard batchId-keyed idempotent-sink pattern that upgrades the
    * pipeline's at-least-once delivery (duplicates on
    * crash-after-publish-before-checkpoint, `pubsub_pipeline.py:48-52`
    * §2-D) to effective exactly-once for this bus. Returns true if the
    * message was actually appended. */
  def publishIdempotent(topic: String, key: String, data: Array[Byte]): Boolean =
    synchronized {
      createTopic(topic)
      val seen = publishedKeys.computeIfAbsent(topic, _ => new java.util.HashSet[String]())
      if (seen.contains(key)) false
      else {
        publish(topic, data)
        seen.add(key)
        true
      }
    }

  /** Inject `n` publish failures on a topic (test hook, models the failed
    * publish future of reference test 2). */
  def failNextPublishes(topic: String, n: Int): Unit = synchronized {
    failPublishes.put(topic, n)
    publishGrace.remove(topic)
  }

  /** Inject a MID-BATCH publish failure: the next `after` publishes
    * succeed, then the following `n` fail — a batch dies with part of its
    * output already in the log (test hook; the partial prefix is the
    * §2-D duplicate window a replay must absorb). */
  def failPublishesAfter(topic: String, after: Int, n: Int): Unit = synchronized {
    publishGrace.put(topic, after)
    failPublishes.put(topic, n)
  }

  /** All payloads currently in a subscription's log (test support). */
  def payloads(name: String): Seq[Array[Byte]] = synchronized {
    sub(name).log.map(_.data).toSeq
  }

  /** Test support: drop all topics/subscriptions. */
  def reset(): Unit = synchronized {
    topics.clear(); subs.clear(); failPublishes.clear()
    publishGrace.clear(); publishedKeys.clear()
  }
}
