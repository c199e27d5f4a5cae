package graft.streaming

import graft.sources.BusRegistry

/** E2E test harness — the engine's `TestClient` (`test_client.py:6-31`):
  * the *reverse* pair of a pipeline under test. It publishes into the
  * pipeline's incoming topic and consumes the pipeline's outgoing
  * subscription, invoking a callback per message and acking it (the
  * reference's default callback prints + acks, `test_client.py:22-26`).
  *
  * Two consumption modes, matching the reference's and the deterministic
  * variant:
  *  - `subscribe()` — the reference's shape (`test_client.py:27`,
  *    `subscriber.subscribe(callback=...)`): a background daemon thread
  *    streams messages to the callback as they arrive, acking each.
  *  - `drain()` — explicit poll, deterministic in tests (no scheduler
  *    thread to race against).
  */
final class BusTestClient(
    inTopic: String,
    outSubscription: String,
    callback: Array[Byte] => Unit = b => println(new String(b, "UTF-8")),
    /** Bus transport spec (see [[Pipeline]]); the cross-process suites
      * point this at a [[graft.sources.BusService]] daemon. */
    busSpec: String = "memory")
    extends AutoCloseable {

  private val bus = BusRegistry.resolve(busSpec)
  @volatile private var running = false
  private var consumer: Thread = _

  /** Publish a payload into the pipeline's incoming topic
    * (`test_client.py:29-31`). */
  def publish(data: Array[Byte]): String = bus.publish(inTopic, data)

  /** Consume every not-yet-acked message of the outgoing subscription:
    * invoke the callback, then ack (callback semantics of
    * `test_client.py:22-26`). Returns the number of messages consumed. */
  def drain(): Int = {
    val from = bus.committedOffset(outSubscription)
    val until = bus.endOffset(outSubscription)
    val msgs = bus.read(outSubscription, from, until)
    msgs.foreach(m => callback(m.data))
    bus.commit(outSubscription, until)
    msgs.size
  }

  /** Async streaming-pull consumption — the reference's
    * `subscriber.subscribe(callback=...)` background scheduler
    * (`test_client.py:27`): a daemon thread delivers each new message to
    * the callback and acks it, until `close()`. Idempotent. */
  def subscribe(pollMs: Long = 10L): this.type = synchronized {
    if (!running) {
      running = true
      consumer = new Thread(() => {
        while (running) {
          if (drain() == 0) Thread.sleep(pollMs)
        }
      }, s"bus-test-client-$outSubscription")
      consumer.setDaemon(true)
      consumer.start()
    }
    this
  }

  /** Stop the background consumer (no-op if `subscribe()` never ran). */
  override def close(): Unit = synchronized {
    running = false
    if (consumer != null) { consumer.join(2000); consumer = null }
  }
}
