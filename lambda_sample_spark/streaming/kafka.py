"""Kafka source/sink variant of the broker leg (SURVEY.md §2.1 S2/S3).

The reference publishes/subscribes MQTT (mqtt/Producer.scala:72-73,
mqtt/Consumer.scala:32-45) with JSON payloads (BinarySerializer.scala:
41-44 — the Smile import is unused). Structured Streaming's first-class
broker is Kafka, so the engine's broker leg is expressed as the Kafka
connector with the same JSON wire format; the rate-source stand-in in
``pipeline.sensor_stream`` stays the default because this sandbox has
neither a broker nor the connector jar.

Enabling it on a real cluster:
  - ship the connector: ``spark-submit --packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version>``
  - set ``SPARK_GRAFT_KAFKA_BOOTSTRAP`` (host:port) and optionally
    ``SPARK_GRAFT_KAFKA_TOPIC`` (default ``sensors.power`` — the
    MQTT topic ``sensors/power`` of application.conf:4, dot-separated
    per Kafka naming rules).

Scale notes: source parallelism = Kafka partition count (partition the
topic by sensor for per-key ordering, mirroring the reference's
single-writer-per-key actor mailbox); the decode is ``from_json`` on
the value bytes — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WIRE_SCHEMA = "sensor STRING, value DOUBLE, anomaly INT"  # MqttEntry, Producer.scala:23
DEFAULT_TOPIC = "sensors.power"

BOOTSTRAP_ENV = "SPARK_GRAFT_KAFKA_BOOTSTRAP"
TOPIC_ENV = "SPARK_GRAFT_KAFKA_TOPIC"


def kafka_enabled() -> bool:
    """The config flag: the Kafka leg activates only when a broker is
    configured; everything else uses the rate-source stand-in."""
    return bool(os.environ.get(BOOTSTRAP_ENV))


def _require_enabled() -> tuple[str, str]:
    bootstrap = os.environ.get(BOOTSTRAP_ENV)
    if not bootstrap:
        raise RuntimeError(
            f"Kafka leg disabled: set {BOOTSTRAP_ENV}=host:port (and ship "
            "the spark-sql-kafka connector) to enable; the rate-source "
            "stand-in (pipeline.sensor_stream) is the default"
        )
    return bootstrap, os.environ.get(TOPIC_ENV, DEFAULT_TOPIC)


# the connector's fixed source schema (Kafka docs): every record a
# Spark job reads from a broker arrives in exactly this shape, so a
# recorded fixture with this schema exercises the decode path the
# broker would drive
KAFKA_SOURCE_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, "
    "offset LONG, timestamp TIMESTAMP, timestampType INT"
)


def decode_kafka_records(raw: DataFrame) -> DataFrame:
    """S3 decode, separated from the broker glue so it is provable
    without one: ``from_json(value)`` into the MqttEntry shape with the
    broker timestamp truncated to ms (Consumer.scala:53-66 semantics —
    ms precision for Cassandra fidelity). A corrupt payload decodes to
    a null struct (null fields downstream), mirroring the reference's
    log-and-continue deserializer, not a stream crash."""
    decoded = raw.select(
        F.from_json(F.col("value").cast("string"), WIRE_SCHEMA).alias("e"),
        F.col("timestamp").alias("broker_ts"),
    )
    ts_ms = F.timestamp_millis(F.unix_millis(F.col("broker_ts")))
    return decoded.select(
        F.col("e.sensor").alias("sensor"),
        ts_ms.alias("ts"),
        F.col("e.value").alias("value"),
        F.col("e.anomaly").alias("anomaly"),
    )


def to_wire(entries: DataFrame) -> DataFrame:
    """S2 serialize, separated from the broker glue: JSON wire format
    with fixed field order (Producer.scala:72-73) keyed by sensor so a
    sensor's readings stay in one Kafka partition (the ordering the
    reference gets from its single consumer actor)."""
    return entries.select(
        F.col("sensor").cast("string").alias("key"),
        F.to_json(F.struct("sensor", "value", "anomaly")).alias("value"),
    )


def sensor_stream_kafka(spark: SparkSession) -> DataFrame:
    """S3: subscribe + decode — ``readStream.format("kafka")`` then
    :func:`decode_kafka_records`. Drop-in replacement for
    ``pipeline.sensor_stream``: same output schema, so the rest of the
    pipeline (upsert, snapshot, serving) is source-agnostic."""
    bootstrap, topic = _require_enabled()
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "latest")
        .load()
    )
    return decode_kafka_records(raw)


def publish_stream_kafka(entries: DataFrame, checkpoint_dir: str):
    """S2: publish — entries serialized to the JSON wire format
    (fixed field order, Producer.scala:72-73) keyed by sensor so a
    sensor's readings stay in one partition (ordering guarantee the
    reference gets from its single consumer actor)."""
    bootstrap, topic = _require_enabled()
    wire = to_wire(entries)
    return (
        wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
