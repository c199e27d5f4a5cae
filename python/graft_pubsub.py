"""PySpark-facing shim for the graft streaming runner.

The reference pipeline's ``processor`` slot is a Python callable
(``pubsub_pipeline.py:62``); this module is the migration surface for
those users: the processor is a plain PySpark ``DataFrame -> DataFrame``
function over the deserialized payload stream -- including pandas UDFs,
so row processing runs in Python workers on executors, exactly where the
reference's processor ran -- while the JVM keeps the bus source
(pull / retry / backoff / lease), the executor-side publish sink, and
ack-on-publish-success (``graft.streaming.PyPipeline``).

Mapping from the reference's constructor:

=============================  =======================================
reference                       shim
=============================  =======================================
processor (per-message fn)      processor (DataFrame -> DataFrame; a
                                pandas UDF inside is the per-message
                                Python function, now batched)
google_cloud_project            part of the ``bus`` spec (a registered
                                scheme, e.g. a GcpPubsubBus factory)
incoming_subscription           incoming_subscription
outgoing_topic                  outgoing_topic
message_deserializer (json)     message_schema (DDL) -> from_json;
                                pass schema=None for raw bytes
result_serializer (json)        every output column -> one JSON object
bulk_limit                      bulk_limit (per-micro-batch admission)
respect_deadline                respect_deadline (fail fast on a
                                transient pull error instead of retry)
subscriber/publisher clients    the ``bus`` option string; transports
                                resolve per-JVM (memory, socket://,
                                or a BusFactories-registered scheme)
=============================  =======================================

Unlike the reference (at-least-once with duplicate publishes on a crash
between publish and ack), ``idempotent=True`` publishes with
content-derived replay-stable keys the bus absorbs -- effective
exactly-once across restarts.

Example::

    from graft_pubsub import PubSubPipeline
    import pyspark.sql.functions as F

    def shout(df):                      # the processor slot
        return df.withColumn("data", F.upper(F.col("data")))

    p = PubSubPipeline(spark, shout, "insub", "out",
                       message_schema="data string")
    p.process()                          # drain-and-stop (AvailableNow)
"""

import os
import tempfile

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

BUS_FORMAT = "graft.sources.BusProvider"


class PubSubPipeline:
    """Pull -> deserialize -> Python processor -> serialize -> publish
    -> ack, on Structured Streaming (the reference loop,
    ``pubsub_pipeline.py:132-167``)."""

    def __init__(self, spark, processor, incoming_subscription,
                 outgoing_topic, message_schema=None, bus="memory",
                 bulk_limit=20, read_partitions=4, respect_deadline=False,
                 retry_backoff_ms=100, idempotent=False,
                 checkpoint_dir=None, lease_micros=0,
                 lease_heartbeat_ms=500, start_at_committed=False):
        self.spark = spark
        self.processor = processor
        self.incoming_subscription = incoming_subscription
        self.outgoing_topic = outgoing_topic
        self.message_schema = message_schema
        self.bus = bus
        self.bulk_limit = bulk_limit
        self.read_partitions = read_partitions
        self.respect_deadline = respect_deadline
        self.retry_backoff_ms = retry_backoff_ms
        self.idempotent = idempotent
        self.checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(
            prefix="graft-py-ckpt-")
        self.lease_micros = lease_micros
        self.lease_heartbeat_ms = lease_heartbeat_ms
        self.start_at_committed = start_at_committed

    def stream(self) -> DataFrame:
        """The deserialized payload stream the processor consumes:
        ``payload`` column (struct per ``message_schema``, or raw binary
        when schema is None) plus the bus metadata columns."""
        df = (self.spark.readStream.format(BUS_FORMAT)
              .option("subscription", self.incoming_subscription)
              .option("bus", self.bus)
              .option("bulkLimit", self.bulk_limit)
              .option("readPartitions", self.read_partitions)
              .option("respectDeadline", self.respect_deadline)
              .option("retryBackoffMs", self.retry_backoff_ms)
              .option("leaseMicros", self.lease_micros)
              .option("leaseHeartbeatMs", self.lease_heartbeat_ms)
              .option("startAtCommitted", self.start_at_committed)
              .load())
        if self.message_schema is None:
            return df.withColumn("payload", F.col("value"))
        return df.withColumn(
            "payload",
            F.from_json(F.col("value").cast("string"), self.message_schema))

    def start(self, available_now: bool = False):
        """Start the pipeline; returns the pyspark StreamingQuery.
        The JVM half serializes every processor-output column into one
        JSON payload, publishes per partition, and acks the subscription
        after each durable batch."""
        out = self.processor(self.stream())
        jquery = self.spark._jvm.graft.streaming.PyPipeline.start(
            out._jdf, self.incoming_subscription, self.outgoing_topic,
            self.bus, self.checkpoint_dir, available_now, self.idempotent)
        from pyspark.sql.streaming import StreamingQuery
        return StreamingQuery(jquery)

    def process(self, timeout_ms: int = 300000):
        """The reference's ``process()`` in bounded form: drain the
        backlog (Trigger.AvailableNow) and return. The reference's
        max_processed_messages counter is superseded by the bounded
        trigger -- including its documented ``==`` overshoot quirk."""
        q = self.start(available_now=True)
        q.awaitTermination(timeout_ms)
        return q


class BulkPubSubPipeline(PubSubPipeline):
    """The reference's bulk variant (``pubsub_pipeline.py:214-242``):
    the processor receives the whole pulled batch at once. In DataFrame
    land every processor already sees the micro-batch, so this is the
    same class; it exists so migrating code keeps its type name. The
    reference's length-preservation hazard (results zipped with
    messages) does not arise: each output row serializes and publishes
    independently of input row count."""
