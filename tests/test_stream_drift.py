"""Streaming drift leg (streaming/drift.py): per-window category
censuses replayed from a file stream equal the batch census of the
same rows; persisted counts are mergeable; JSD scoring vs a reference
mix flags the planted shifted window and only it."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from lambda_sample_spark.operators.drift import jsd_from_counts
from lambda_sample_spark.streaming.drift import (
    score_windows_vs_reference,
    windowed_category_counts,
)

BASE = datetime(2024, 3, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + timedelta(minutes=m), t)
            for i, (m, t) in enumerate(rows)
        ],
        "event_id BIGINT, ts TIMESTAMP, event_type STRING",
    )


def test_stream_census_equals_batch_census(spark, tmp_path):
    # window 0: 3 click / 1 view; window 1: 1 click / 3 error; a +40
    # min row pushes the watermark past both so append emits them
    rows = [
        (1.0, "click"), (2.0, "click"), (3.0, "click"), (4.0, "view"),
        (11.0, "click"), (12.0, "error"), (13.0, "error"), (14.0, "error"),
        (40.0, "view"),
    ]
    src = str(tmp_path / "src")
    _events(spark, rows).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, event_type STRING"
    ).parquet(src)
    out = str(tmp_path / "out")
    q = (
        windowed_category_counts(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.win_start.isoformat(), r.event_type): r.cnt
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.win_start.isoformat(), r.event_type): r.cnt
        for r in (
            _events(spark, rows)
            .groupBy(
                F.window("ts", "10 minutes").alias("win"), F.col("event_type")
            )
            .agg(F.count("*").alias("cnt"))
            .select(F.col("win.start").alias("win_start"), "event_type", "cnt")
            # the stream's final window stays OPEN (nothing past it
            # advances the watermark) — the batch twin must drop it too
            .where(F.col("win_start") < BASE + timedelta(minutes=40))
            .collect()
        )
    }
    assert got == want and len(got) == 4


def test_counts_merge_to_coarser_windows(spark):
    # the persisted unit is mergeable: two 10-min censuses re-aggregate
    # to the 20-min census of the union — the property JSD itself lacks
    rows = [
        (1.0, "click"), (2.0, "view"), (11.0, "click"), (12.0, "click"),
    ]
    ev = _events(spark, rows)
    fine = (
        ev.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "event_type", "cnt")
    )
    merged = {
        (r.win_start.isoformat(), r.event_type): r.cnt
        for r in (
            fine.groupBy(
                F.window("win_start", "20 minutes").alias("win"), "event_type"
            )
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.col("win.start").alias("win_start"), "event_type", "cnt")
            .collect()
        )
    }
    direct = {
        (r.win_start.isoformat(), r.event_type): r.cnt
        for r in (
            ev.groupBy(F.window("ts", "20 minutes").alias("win"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("win.start").alias("win_start"), "event_type", "cnt")
            .collect()
        )
    }
    assert merged == direct


def test_scoring_flags_only_the_shifted_window(spark):
    # reference mix 3:1 click:view; window A repeats it, window B is
    # all error — only B crosses any sensible threshold
    ref = spark.createDataFrame(
        [("click", 300), ("view", 100)], "event_type STRING, cnt BIGINT"
    )
    wc = spark.createDataFrame(
        [
            (BASE, "click", 30), (BASE, "view", 10),
            (BASE + timedelta(minutes=10), "error", 40),
        ],
        "win_start TIMESTAMP, event_type STRING, cnt BIGINT",
    )
    got = {
        r.win_start: r.jsd
        for r in score_windows_vs_reference(wc, ref).collect()
    }
    assert got[BASE] < 0.01, got
    assert got[BASE + timedelta(minutes=10)] > 0.4, got
    # and the scoring math IS the batch operator's: same frame through
    # jsd_from_counts directly
    direct = {
        r._k: r.jsd
        for r in jsd_from_counts(
            spark.createDataFrame(
                [(BASE, "click", 300), (BASE, "view", 100)],
                "_k TIMESTAMP, event_type STRING, r_cnt BIGINT",
            ),
            spark.createDataFrame(
                [(BASE, "click", 30), (BASE, "view", 10)],
                "_k TIMESTAMP, event_type STRING, c_cnt BIGINT",
            ),
            key_col="_k",
        ).collect()
    }
    assert direct[BASE] == got[BASE]
