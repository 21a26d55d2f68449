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


def test_streamed_sketches_merge_to_exact_distincts(spark, tmp_path):
    # The speed layer appends per-window HLL SKETCHES (not just
    # estimates); the batch layer must be able to union-merge them to
    # any coarser range without raw data. Small cardinalities here, so
    # the sketch estimates are exact — the assertion is equality, not
    # a bound.
    from lambda_sample_spark.streaming.watermark import start_user_sketches

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        (
            spark.createDataFrame(
                rows, "user_id long, event_type string, offset_min double"
            )
            .select(
                "user_id",
                "event_type",
                F.timestamp_millis(
                    F.lit(BASE) + (F.col("offset_min") * 60000).cast("long")
                ).alias("ts"),
            )
            .write.mode("append")
            .parquet(src)
        )

    # window [0,10): users {1,2,3} click (3 distinct, user 1 twice);
    # window [10,20): users {2,4} click; the +40 row pushes the
    # watermark past both; a late row for [0,10) must not resurface
    write(
        [
            (1, "click", 1.0),
            (1, "click", 2.0),
            (2, "click", 3.0),
            (3, "click", 9.0),
            (2, "click", 11.0),
            (4, "click", 15.0),
            (9, "click", 40.0),
        ]
    )
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    start_user_sketches(stream, out, ckpt).awaitTermination(120)
    write([(99, "click", 5.0), (9, "click", 55.0)])  # late + closer
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    start_user_sketches(stream, out, ckpt).awaitTermination(120)

    sink = spark.read.parquet(out)
    per_window = {
        r.window_start.isoformat(): r.n_users
        for r in sink.where(F.col("event_type") == "click").collect()
    }
    finalized = sorted(per_window.items())
    # [0,10) -> 3 distinct (late user 99 dropped), [10,20) -> 2,
    # [40,50) -> 1
    assert [n for _, n in finalized] == [3, 2, 1], finalized

    # batch-layer merge: union the persisted sketches — 1,2,3,2,4,9
    # -> 5 distinct users, no raw events involved
    merged = (
        sink.groupBy("event_type")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("n"))
        .head()
        .n
    )
    assert merged == 5, merged


def test_streamed_cms_cells_merge_to_exact_counts(spark, tmp_path):
    # The frequency twin: persisted per-window CMS cells must merge by
    # cell-wise sum into a sketch whose point estimates reproduce the
    # exact per-token counts (tiny vocab -> no bucket collisions, and
    # the md5 buckets are deterministic, so equality is stable).
    from lambda_sample_spark.operators.multidim import cms_estimate, cms_merge
    from lambda_sample_spark.streaming.watermark import start_key_cms

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = (
        [("spark", 1.0)] * 3
        + [("duck", 2.0)] * 2
        + [("spark", 12.0)] * 4
        + [("goose", 15.0)]
        + [("spark", 40.0)]  # watermark pusher, lands in its own window
    )
    (
        spark.createDataFrame(rows, "tok string, offset_min double")
        .select(
            "tok",
            F.timestamp_millis(
                F.lit(BASE) + (F.col("offset_min") * 60000).cast("long")
            ).alias("ts"),
        )
        .write.mode("append")
        .parquet(src)
    )
    stream = spark.readStream.schema("tok string, ts timestamp").parquet(src)
    start_key_cms(stream, "tok", out, ckpt).awaitTermination(120)

    sink = spark.read.parquet(out)
    # two finalized windows x 4 hash rows of cells at most (the [40,50)
    # window is still open)
    assert sink.select("window_start").distinct().count() == 2
    merged = cms_merge(sink)
    probes = spark.createDataFrame(
        [("spark", 7), ("duck", 2), ("goose", 1)], "tok string, n_exact long"
    )
    got = {
        r.tok: (r.n_exact, r.n_est)
        for r in cms_estimate(merged, probes, "tok").collect()
    }
    assert got == {
        "spark": (7, 7),
        "duck": (2, 2),
        "goose": (1, 1),
    }, got


def test_hash_sampled_stream_is_deterministic_and_unbiased(spark, tmp_path):
    # Stateless streaming sampling: the sink must hold exactly the
    # deterministic hash-subset (identical to the batch filter over
    # the same data — replay-stable), at roughly the requested rate.
    from lambda_sample_spark.streaming.watermark import hash_sampled_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [(i, float(i % 97)) for i in range(4000)]
    spark.createDataFrame(rows, "event_id long, value double").write.parquet(src)

    stream = spark.readStream.schema("event_id long, value double").parquet(src)
    q = (
        hash_sampled_stream(stream, rate=0.25)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.event_id for r in spark.read.parquet(out).collect()}
    batch = {
        r.event_id
        for r in hash_sampled_stream(
            spark.read.parquet(src), rate=0.25
        ).collect()
    }
    assert got == batch  # replay-identical to the batch filter
    assert 0.2 < len(got) / 4000 < 0.3  # near the requested rate
