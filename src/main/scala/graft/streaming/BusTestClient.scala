package graft.streaming

import graft.sources.InMemoryBus

/** E2E test harness — the engine's `TestClient` (`test_client.py:6-31`):
  * the *reverse* pair of a pipeline under test. It publishes into the
  * pipeline's incoming topic and consumes the pipeline's outgoing
  * subscription, invoking a callback per message and acking it (the
  * reference's default callback prints + acks, `test_client.py:22-26`).
  *
  * The reference consumes via an async background streaming pull; here
  * `drain()` is an explicit poll (deterministic in tests — no background
  * scheduler thread to race against).
  */
final class BusTestClient(
    inTopic: String,
    outSubscription: String,
    callback: Array[Byte] => Unit = b => println(new String(b, "UTF-8"))) {

  /** Publish a payload into the pipeline's incoming topic
    * (`test_client.py:29-31`). */
  def publish(data: Array[Byte]): String = InMemoryBus.publish(inTopic, data)

  /** Consume every not-yet-acked message of the outgoing subscription:
    * invoke the callback, then ack (callback semantics of
    * `test_client.py:22-26`). Returns the number of messages consumed. */
  def drain(): Int = {
    val from = InMemoryBus.committedOffset(outSubscription)
    val until = InMemoryBus.endOffset(outSubscription)
    val msgs = InMemoryBus.read(outSubscription, from, until)
    msgs.foreach(m => callback(m.data))
    InMemoryBus.commit(outSubscription, until)
    msgs.size
  }
}
