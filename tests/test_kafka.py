"""Kafka-leg tests: configuration gating is testable without a broker,
and the decode/serialize transformations are PROVEN against a recorded
fixture carrying the connector's exact source schema — only the final
``format("kafka")`` socket glue needs a real broker + connector jar
(documented skip; SURVEY.md §2.1 S2/S3; this sandbox has neither).
"""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.kafka import (
    BOOTSTRAP_ENV,
    KAFKA_SOURCE_SCHEMA,
    WIRE_SCHEMA,
    decode_kafka_records,
    kafka_enabled,
    sensor_stream_kafka,
    to_wire,
)


def _fixture_records(spark):
    """Recorded fixture: rows exactly as the Kafka connector delivers
    them (key/value BINARY + broker metadata) — payload bytes match
    what the reference's Producer publishes, plus one corrupt record."""
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5, 678901)
    rows = [
        (
            b"Old Mill",
            b'{"sensor":"Old Mill","value":42.5,"anomaly":0}',
            "sensors.power", 0, 17, ts, 0,
        ),
        (
            b"Turbine",
            b'{"sensor":"Turbine","value":-120.0,"anomaly":1}',
            "sensors.power", 1, 3, ts, 0,
        ),
        (b"Bad", b"not json \xff\x00", "sensors.power", 1, 4, ts, 0),
    ]
    return spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)


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


def test_decode_kafka_fixture(spark):
    # S3 decode driven by the recorded connector-schema fixture: the
    # same dataflow a broker feeds, minus the socket
    out = decode_kafka_records(_fixture_records(spark)).collect()
    assert [r.sensor for r in out[:2]] == ["Old Mill", "Turbine"]
    assert (out[0].value, out[0].anomaly) == (42.5, 0)
    assert (out[1].value, out[1].anomaly) == (-120.0, 1)
    # broker timestamp truncated to ms (Consumer.scala:64 fidelity)
    assert out[0].ts.microsecond == 678000
    # corrupt payload -> null fields, stream survives (log-and-continue)
    assert out[2].sensor is None and out[2].value is None


def test_wire_publish_subscribe_roundtrip(spark):
    # S2 -> S3: what publish_stream_kafka hands the connector, fed back
    # through the subscribe decode, reproduces the entries
    entries = spark.createDataFrame(
        [("Old Mill", 42.5, 0), ("Turbine", -120.0, 1)],
        "sensor STRING, value DOUBLE, anomaly INT",
    )
    wire = to_wire(entries)
    assert wire.columns == ["key", "value"]  # the connector's sink contract
    ts = datetime.datetime(2026, 1, 2, 3, 4, 5)
    as_source = wire.select(
        F.col("key").cast("binary"),
        F.col("value").cast("binary"),
        F.lit("sensors.power").alias("topic"),
        F.lit(0).alias("partition"),
        F.lit(0).cast("long").alias("offset"),
        F.lit(ts).alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    back = decode_kafka_records(as_source).orderBy("sensor").collect()
    assert [(r.sensor, r.value, r.anomaly) for r in back] == [
        ("Old Mill", 42.5, 0),
        ("Turbine", -120.0, 1),
    ]


def test_kafka_decode_drives_pipeline_streaming(spark, tmp_path):
    # the decoded stream is a drop-in for sensor_stream: run the decode
    # as a real streaming query over a file source carrying the
    # connector schema, through the ingest sink, into the LWW view
    from lambda_sample_spark.streaming.pipeline import lww_entries

    src = str(tmp_path / "recorded")
    _fixture_records(spark).write.parquet(src)
    stream = spark.readStream.schema(KAFKA_SOURCE_SCHEMA).parquet(src)
    decoded = decode_kafka_records(stream).where(F.col("sensor").isNotNull())
    entry_dir = str(tmp_path / "entry")
    q = (
        decoded.writeStream.format("parquet")
        .option("path", entry_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    view = lww_entries(spark, entry_dir)
    assert view.columns == ["sensor", "ts", "value", "anomaly"]
    assert {r.sensor for r in view.collect()} == {"Old Mill", "Turbine"}


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
