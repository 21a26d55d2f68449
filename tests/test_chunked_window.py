"""chunked_range_stats: the ts-chunk + boundary-replication
decomposition of the per-key sliding time-range window (the
"per-salt windows" skew mitigation docs/SCALE.md promises). Pins:
exact equality against the naive single-partition-per-key window on
adversarial corpora (hot key, frames straddling chunk boundaries,
NULL values, duplicate timestamps), the parallelism claim (the
window partitions by (key, chunk), not key alone), and the
chunk_ms >= window_ms precondition."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lambda_sample_spark.operators.sessions import (
    _WIN_AVG_TEMPLATE,
    _WIN_AVG_U,
    chunked_range_stats,
)
from lambda_sample_spark.plans import shim


def _naive(ev, window_ms):
    """The reference formulation: one partition per key, however hot."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts_ms")
        .rangeBetween(-window_ms, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "event_type",
            F.col("ts_ms"),
            F.min("value").over(w).alias("rw_min"),
            F.max("value").over(w).alias("rw_max"),
            F.count("*").over(w).alias("rw_n"),
            F.sum(F.expr(_WIN_AVG_U)).over(w).alias("_u"),
            F.count("value").over(w).alias("_nv"),
        ).select(
            "event_id",
            "event_type",
            "ts_ms",
            "rw_min",
            "rw_max",
            "rw_n",
            F.expr(_WIN_AVG_TEMPLATE.format(u="_u", n="_nv", div="div")).alias(
                "rw_avg"
            ),
        )
    )


def _corpus(spark, n=3000, keys=2, span_ms=400_000, seed=13):
    """Hot-key corpus: key 0 owns ~90% of rows; timestamps cluster so
    frames straddle chunk boundaries; some NULL values; duplicate ts."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = 0 if rng.random() < 0.9 else rng.randrange(1, keys)
        ts = rng.randrange(span_ms)
        if rng.random() < 0.05:
            ts = (ts // 1000) * 1000  # force duplicate-ts collisions
        val = None if rng.random() < 0.03 else round(rng.uniform(-50, 150), 2)
        rows.append((i, f"k{k}", ts, val))
    return spark.createDataFrame(
        rows, "event_id long, event_type string, ts_ms long, value double"
    )


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunked_equals_naive_on_hot_key_corpus(spark):
    ev = _corpus(spark)
    # ev already carries ts_ms; chunked_range_stats re-derives it from
    # ts, so feed a ts column it can convert
    evts = ev.select(
        "event_id",
        "event_type",
        F.timestamp_millis("ts_ms").alias("ts"),
        "value",
    )
    got = chunked_range_stats(evts, window_ms=30_000, chunk_ms=50_000)
    want = _naive(ev, window_ms=30_000)
    assert _pairs(got) == _pairs(want)


def test_window_exactly_chunk_sized_boundaries(spark):
    """chunk_ms == window_ms (the tightest legal setting): every
    frame can reach the full previous chunk's tail."""
    ev = _corpus(spark, n=800, span_ms=120_000, seed=7)
    evts = ev.select(
        "event_id", "event_type", F.timestamp_millis("ts_ms").alias("ts"), "value"
    )
    got = chunked_range_stats(evts, window_ms=40_000, chunk_ms=40_000)
    want = _naive(ev, window_ms=40_000)
    assert _pairs(got) == _pairs(want)


def test_negative_timestamps_pre_1970(spark):
    """Pre-1970 timestamps make ts_ms negative; Spark's `div`
    truncates toward zero there, so chunk assignment needs the
    floor-correction CASE (ADVICE r13) — pinned by straddling the
    epoch with frames that cross chunk boundaries on both sides."""
    ev = _corpus(spark, n=1200, span_ms=240_000, seed=23).withColumn(
        "ts_ms", F.col("ts_ms") - F.lit(120_000)
    )
    evts = ev.select(
        "event_id", "event_type", F.timestamp_millis("ts_ms").alias("ts"), "value"
    )
    got = chunked_range_stats(evts, window_ms=30_000, chunk_ms=50_000)
    want = _naive(ev, window_ms=30_000)
    assert _pairs(got) == _pairs(want)


def test_precondition_rejected(spark):
    ev = _corpus(spark, n=10)
    evts = ev.select(
        "event_id", "event_type", F.timestamp_millis("ts_ms").alias("ts"), "value"
    )
    with pytest.raises(AssertionError):
        chunked_range_stats(evts, window_ms=50_000, chunk_ms=40_000)


def test_partitions_by_key_and_chunk(spark):
    """The scale claim itself: the physical window partitions on
    (key, chunk) — parallelism grows with the time span, not the key
    cardinality the naive plan is stuck at."""
    ev = _corpus(spark, n=200)
    evts = ev.select(
        "event_id", "event_type", F.timestamp_millis("ts_ms").alias("ts"), "value"
    )
    plan = shim.physical_plan(chunked_range_stats(evts, 30_000, 50_000))
    assert "chunk" in plan
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert any("chunk" in ln for ln in win_lines), win_lines
