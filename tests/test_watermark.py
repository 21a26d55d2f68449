"""Watermark semantics: closed windows emit exactly once; late rows
below the watermark are dropped, not merged into finalized windows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.watermark import start_windowed_counts

BASE = 1700000400000  # epoch ms anchor, divisible by 10 min (2833334 * 600000)


def _write_batch(spark, src, rows):
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
        .parquet(src)
    )


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(
        "sensor string, ts timestamp, value double"
    ).parquet(src)
    q = start_windowed_counts(stream, out, ckpt)
    q.awaitTermination(120)


def test_late_data_dropped_after_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: window [0,10) gets 3 rows; a row at +20 min advances the
    # max event time so the watermark (delay 5 min) passes +15 min and
    # finalizes [0,10)
    _write_batch(
        spark,
        src,
        [("a", 1.0, 10.0), ("a", 2.0, 20.0), ("a", 9.0, 30.0), ("a", 20.0, 99.0)],
    )
    _run(spark, src, out, ckpt)
    first = {
        (r.sensor, r.window_start.isoformat()): r.n
        for r in spark.read.parquet(out).collect()
    }
    # only [0,10) is below the watermark; [20,30) is still open
    assert list(first.values()) == [3]

    # batch 2: a LATE row for the finalized [0,10) window (below the
    # +15 min watermark -> dropped) and a row at +35 min that closes
    # the [20,30) window
    _write_batch(spark, src, [("a", 5.0, 1000.0), ("a", 35.0, 7.0)])
    _run(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    got = {r.window_start.isoformat(): (r.n, r.avg_value) for r in rows}

    assert len(rows) == 2, f"expected exactly 2 finalized windows, got {rows}"
    # [0,10) emitted once with the original 3 rows — the late 1000.0
    # never appears (avg still 20.0)
    w0 = min(got)
    assert got[w0] == (3, 20.0)
    # [20,30) closed by the +35 row with exactly its one original row
    w2 = max(got)
    assert got[w2] == (1, 99.0)
