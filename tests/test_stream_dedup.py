"""Streaming dedup semantics: re-deliveries within the watermark are
dropped across micro-batches; state is evicted past the bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.dedup import (
    dedup_stream_by_content,
    dedup_stream_by_key,
)

BASE = 1700000400000


def _write(spark, path, rows):
    (
        spark.createDataFrame(rows, "sensor string, offset_min double, value double")
        .select(
            "sensor",
            F.timestamp_millis(
                F.lit(BASE) + (F.col("offset_min") * 60000).cast("long")
            ).alias("ts"),
            "value",
        )
        .write.mode("append")
        .parquet(path)
    )


def _run(spark, src, out, ckpt, op):
    stream = spark.readStream.schema(
        "sensor string, ts timestamp, value double"
    ).parquet(src)
    q = (
        op(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_key_dedup_across_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    op = lambda s: dedup_stream_by_key(s, ["sensor", "ts"])
    # batch 1: a duplicate (sensor, ts) pair inside one batch
    _write(spark, src, [("a", 1.0, 10.0), ("a", 1.0, 10.0), ("b", 1.0, 5.0)])
    _run(spark, src, out, ckpt, op)
    # batch 2: the SAME (a, +1min) re-delivered across batches -> state
    # still inside the watermark -> dropped; plus one genuinely new row
    _write(spark, src, [("a", 1.0, 10.0), ("a", 2.0, 11.0)])
    _run(spark, src, out, ckpt, op)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # (a,1) once, (b,1), (a,2)
    assert sum(1 for r in rows if r.sensor == "a" and r.value == 10.0) == 1


def test_content_dedup_keeps_first_arrival(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    op = lambda s: dedup_stream_by_content(s.withColumn("payload", F.format_string("%s|%.1f", "sensor", "value")), "payload")
    _write(spark, src, [("a", 1.0, 10.0), ("a", 2.0, 10.0), ("a", 3.0, 99.0)])
    _run(spark, src, out, ckpt, op)
    rows = spark.read.parquet(out).collect()
    # identical payload "a|10.0" at +1 and +2 -> one survivor
    assert len(rows) == 2
    assert {r.value for r in rows} == {10.0, 99.0}
