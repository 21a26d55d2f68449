"""Kafka-leg tests: configuration gating is testable without a broker;
the wire round-trip is covered through the JSON codec the leg reuses.
The end-to-end broker path needs a real Kafka + the connector jar —
documented skip (SURVEY.md §2.1 S2/S3; this sandbox has neither).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.kafka import (
    BOOTSTRAP_ENV,
    WIRE_SCHEMA,
    kafka_enabled,
    sensor_stream_kafka,
)


def test_disabled_without_config(monkeypatch, spark):
    monkeypatch.delenv(BOOTSTRAP_ENV, raising=False)
    assert not kafka_enabled()
    with pytest.raises(RuntimeError, match="Kafka leg disabled"):
        sensor_stream_kafka(spark)


def test_enabled_with_config(monkeypatch):
    monkeypatch.setenv(BOOTSTRAP_ENV, "broker:9092")
    assert kafka_enabled()


def test_wire_format_roundtrip(spark):
    # the exact payload shape the Kafka leg produces/consumes:
    # JSON with Jackson's declaration field order (Producer.scala:23)
    df = spark.createDataFrame(
        [("Old Mill", 42.5, 0)], "sensor STRING, value DOUBLE, anomaly INT"
    )
    wire = df.select(
        F.to_json(F.struct("sensor", "value", "anomaly")).alias("value")
    )
    payload = wire.first()["value"]
    assert payload == '{"sensor":"Old Mill","value":42.5,"anomaly":0}'
    back = (
        wire.select(F.from_json("value", WIRE_SCHEMA).alias("e"))
        .select("e.*")
        .first()
    )
    assert (back.sensor, back.value, back.anomaly) == ("Old Mill", 42.5, 0)


@pytest.mark.skipif(
    not kafka_enabled(),
    reason="no Kafka broker/connector in this environment "
    f"(set {BOOTSTRAP_ENV} and ship spark-sql-kafka to run)",
)
def test_kafka_stream_end_to_end(spark, tmp_path):  # pragma: no cover
    stream = sensor_stream_kafka(spark)
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        "sensor", "ts", "value", "anomaly",
    ]
