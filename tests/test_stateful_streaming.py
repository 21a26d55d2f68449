"""Stateful count-window streaming: applyInPandasWithState keeps the
per-sensor newest-200 buffer; scores must match the batch formulation
on the same data."""

from __future__ import annotations

import math
import time

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.stateful import (
    RECENT_N,
    stateful_fast_anomaly,
)


def test_stateful_matches_batch(spark, tmp_path):
    # deterministic input: two sensors, 300 rows each (window must
    # truncate to the newest 200), one spike at the end of sensor "a"
    src = str(tmp_path / "src")
    rows = []
    for i in range(300):
        rows.append(("a", i, 10.0 if i < 299 else 500.0))
        rows.append(("b", i, float(i % 7)))
    (
        spark.createDataFrame(rows, "sensor string, seq int, value double")
        .withColumn("ts", F.timestamp_millis(F.lit(1700000000000) + F.col("seq") * 200))
        .drop("seq")
        .write.mode("overwrite")
        .parquet(src)
    )

    stream = spark.readStream.schema(
        "sensor string, value double, ts timestamp"
    ).parquet(src)
    q = (
        stateful_fast_anomaly(stream)
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = {
        r.sensor: r
        for r in spark.sql(
            "SELECT * FROM stateful_out ORDER BY sensor"
        ).collect()
    }

    # batch reference: newest-200 per key, population stddev, score
    batch = (
        spark.read.parquet(src)
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("sensor")
                .orderBy(F.col("ts").desc())
            ),
        )
        .where(F.col("rn") <= RECENT_N)
        .groupBy("sensor")
        .agg(
            F.count("*").alias("n"),
            F.avg("value").alias("avg_value"),
            F.stddev_pop("value").alias("sd_value"),
        )
    )
    bref = {r.sensor: r for r in batch.collect()}

    for s in ("a", "b"):
        assert out[s].n == RECENT_N == bref[s].n
        assert math.isclose(out[s].avg_value, bref[s].avg_value, rel_tol=1e-9)
        assert math.isclose(out[s].sd_value, bref[s].sd_value, rel_tol=1e-9)

    # sensor a ends on the 500.0 spike: score must clamp to 1.0
    assert out["a"].latest_value == 500.0
    assert out["a"].fast_anomaly == 1.0
    # sensor b's latest (299 % 7 = 5) is within its own noise: score < 1
    assert 0.0 <= out["b"].fast_anomaly < 1.0


def test_state_is_bounded(spark, tmp_path):
    # feed two batches; state after both must still hold <= RECENT_N
    src = str(tmp_path / "src2")
    df = spark.range(1000).select(
        F.lit("x").alias("sensor"),
        F.timestamp_millis(1700000000000 + F.col("id") * 100).alias("ts"),
        (F.col("id") % 100).cast("double").alias("value"),
    )
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        "sensor string, ts timestamp, value double"
    ).parquet(src)
    q = (
        stateful_fast_anomaly(stream)
        .writeStream.format("memory")
        .queryName("stateful_bounded")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_bounded").collect()
    assert rows and all(r.n <= RECENT_N for r in rows)


def test_stateful_windowed_bottomk_emits_final_sample_on_close(spark, tmp_path):
    # Fixed-size per-window sample with bounded state: the final
    # sample must emit exactly once when the watermark closes the
    # window, equal the batch bottom-k over the same rows, never
    # exceed k, and drop late rows.
    from pyspark.sql import functions as F

    from lambda_sample_spark.streaming.stateful import (
        stateful_windowed_bottomk,
    )

    BASE = 1700000400000
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    K = 3

    def write(rows):
        (
            spark.createDataFrame(
                rows, "event_id long, event_type string, offset_min double, value double"
            )
            .select(
                "event_id",
                "event_type",
                F.timestamp_millis(
                    F.lit(BASE) + (F.col("offset_min") * 60000).cast("long")
                ).alias("ts"),
                "value",
            )
            .write.mode("append")
            .parquet(src)
        )

    def run():
        stream = spark.readStream.schema(
            "event_id long, event_type string, ts timestamp, value double"
        ).parquet(src)
        q = (
            stateful_windowed_bottomk(stream, k=K)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # window [0,10): 6 rows (sample must cut to K=3); pusher at +20
    # advances the watermark past +15 and closes it
    write(
        [(i, "click", float(i), float(10 * i)) for i in range(6)]
        + [(100, "click", 20.0, 1.0)]
    )
    run()
    first = spark.read.parquet(out).collect()
    assert len(first) == K
    assert {r.window_start_ms for r in first} == {BASE}
    # equals the batch bottom-k over the same 6 rows
    import hashlib

    def md5(i):
        return hashlib.md5(str(i).encode()).hexdigest()

    expect = sorted(range(6), key=lambda i: (md5(i), i))[:K]
    assert sorted(r.event_id for r in first) == sorted(expect)

    # late row for the closed window is dropped; +40 pusher closes
    # [20,30) (1 row — sample smaller than K is the whole window)
    write([(7, "click", 5.0, 70.0), (101, "click", 40.0, 2.0)])
    run()
    rows = spark.read.parquet(out).collect()
    by_win = {}
    for r in rows:
        by_win.setdefault(r.window_start_ms, []).append(r.event_id)
    assert sorted(by_win[BASE]) == sorted(expect)  # unchanged, no dup
    assert by_win[BASE + 20 * 60000] == [100]


def test_stateful_bottomk_null_contract_and_merge_adapter(spark, tmp_path):
    # NULL-keyed rows are excluded (not a crash), NULL values survive
    # as NULLs in the emitted sample, and the adapter makes the sink
    # rows consumable by the batch bottomk_merge with results equal to
    # a direct batch bottom-k over the same (closed-window) rows.
    from pyspark.sql import functions as F

    from lambda_sample_spark.operators.multidim import _bottomk, bottomk_merge
    from lambda_sample_spark.streaming.stateful import (
        stateful_windowed_bottomk,
        stream_samples_as_sketch,
    )

    BASE = 1700000400000
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = (
        [(i, "click", float(i % 8), float(i)) for i in range(40)]
        + [(50, "click", 3.0, None)]       # NULL value: sampleable
        + [(None, "click", 4.0, 99.0)]     # NULL key: excluded
        + [(999, "click", 25.0, 1.0)]      # watermark pusher
    )
    (
        spark.createDataFrame(
            rows, "event_id long, event_type string, offset_min double, value double"
        )
        .select(
            "event_id", "event_type",
            F.timestamp_millis(
                F.lit(BASE) + (F.col("offset_min") * 60000).cast("long")
            ).alias("ts"),
            "value",
        )
        .write.parquet(src)
    )
    stream = spark.readStream.schema(
        "event_id long, event_type string, ts timestamp, value double"
    ).parquet(src)
    q = (
        stateful_windowed_bottomk(stream, k=64)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    sink = spark.read.parquet(out)
    ids = {r.event_id for r in sink.collect()}
    assert None not in ids            # NULL key excluded, no crash
    assert 50 in ids                  # NULL-value row owns its slot
    nulls = sink.where(F.col("event_id") == 50).collect()
    assert len(nulls) == 1 and nulls[0].value is None  # NULL, not NaN

    # merge adapter: stream sink rows -> batch sketch schema -> month
    # merge equals a direct batch bottom-k over the same closed rows
    batch = (
        spark.read.parquet(src)
        .where(F.col("event_id").isNotNull() & (F.col("event_id") != 999))
    )
    merged = bottomk_merge(stream_samples_as_sketch(sink), "month", k=64)
    direct = _bottomk(batch, F.date_trunc("month", "ts"), k=64)
    a = {(r.bucket, r.event_type, r.event_id) for r in merged.collect()}
    b = {(r.bucket, r.event_type, r.event_id) for r in direct.collect()}
    assert a == b
