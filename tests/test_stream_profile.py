"""Streaming profile leg (streaming/profile.py): availableNow replay
of per-window partials equals the batch aggregation of the same
rows; merged partials reproduce the whole-corpus profile exactly
(HLL included — union-of-sketches == sketch-of-union); nulls feed
completeness."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.profile import (
    finalize_profile,
    merge_profile_partials,
    windowed_profile_partials,
)

BASE = datetime(2024, 3, 1)
SCHEMA = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, BASE + timedelta(minutes=m), u, v)
            for i, (m, u, v) in enumerate(rows)
        ],
        SCHEMA,
    )


ROWS = [
    # window 0 (minutes 0-10): 3 rows, one NULL value, users 1/1/2
    (1.0, 1, 10.0),
    (2.0, 1, None),
    (3.0, 2, 30.0),
    # window 1 (minutes 10-20): 2 rows, users 2/3
    (11.0, 2, 5.0),
    (12.0, 3, 7.0),
    # watermark pusher (its own window)
    (40.0, 9, 1.0),
]


def _replay(spark, tmp_path):
    src = str(tmp_path / "src")
    _events(spark, ROWS).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = str(tmp_path / "out")
    q = (
        windowed_profile_partials(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_replay_matches_batch_and_nulls_hit_completeness(spark, tmp_path):
    got = {
        r["win_start"].isoformat(): r
        for r in finalize_profile(_replay(spark, tmp_path)).collect()
    }
    w0 = got[BASE.isoformat()]
    assert w0["n_rows"] == 3 and w0["n_null"] == 1
    assert abs(w0["completeness"] - 2.0 / 3) < 1e-6
    assert w0["mean"] == 20.0  # (10+30)/2, null excluded
    assert w0["min_val"] == 10.0 and w0["max_val"] == 30.0
    assert w0["n_distinct_est"] == 2  # users {1, 2}: HLL exact here
    w1 = got[(BASE + timedelta(minutes=10)).isoformat()]
    assert w1["n_rows"] == 2 and w1["n_null"] == 0
    assert w1["mean"] == 6.0


def test_merged_partials_equal_whole_corpus_profile(spark, tmp_path):
    partials = _replay(spark, tmp_path)
    merged = finalize_profile(merge_profile_partials(partials)).collect()[0]
    # the minute-40 pusher's own window never closes (nothing moves
    # the watermark past it), so the merged partials cover exactly
    # the two emitted windows — compare against the batch profile of
    # those rows
    ev = _events(spark, ROWS).where(
        F.col("ts") < BASE + timedelta(minutes=20)
    )
    v = F.col("value")
    want = ev.agg(
        F.count("*").alias("n_rows"),
        F.count(v).alias("n_val"),
        F.sum(v.cast("decimal(28,10)")).alias("s1"),
        F.min(v).alias("mn"),
        F.max(v).alias("mx"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("nd"),
    ).collect()[0]
    assert merged["n_rows"] == want["n_rows"]
    assert merged["n_null"] == want["n_rows"] - want["n_val"]
    assert merged["min_val"] == want["mn"]
    assert merged["max_val"] == want["mx"]
    assert merged["mean"] == round(
        float(want["s1"]) / want["n_val"], 6
    )
    # union-of-window-sketches must estimate the same as the
    # one-shot sketch over all rows
    assert merged["n_distinct_est"] == int(want["nd"])
