"""Streaming session windows: gap merging, gap splitting, and
watermark-driven closure (streaming/watermark.py session_counts —
the streaming twin of the batch sessionize operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.watermark import start_session_counts

BASE = 1700000400000  # epoch ms anchor


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
    q = start_session_counts(stream, out, ckpt)
    q.awaitTermination(120)


def test_sessions_merge_split_and_close(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # sensor a: rows at +0, +1, +2 min fall within the 5-min gap of
    # each other -> ONE session [0, 2+5); the row at +30 is beyond the
    # gap -> its own session, AND it advances the watermark to +25,
    # past the first session's close (+7) -> first session emits
    _write_batch(
        spark,
        src,
        [("a", 0.0, 10.0), ("a", 1.0, 20.0), ("a", 2.0, 30.0), ("a", 30.0, 99.0)],
    )
    _run(spark, src, out, ckpt)
    first = spark.read.parquet(out).collect()
    assert len(first) == 1
    s = first[0]
    assert s.n == 3 and s.avg_value == 20.0
    # session end = last event + gap
    assert (s.session_end.timestamp() - s.session_start.timestamp()) == 7 * 60

    # second batch: +31 min extends the open session (within gap of
    # +30); +60 min pushes the watermark past its close -> the
    # EXTENDED session [30, 36) emits exactly once with both rows
    _write_batch(spark, src, [("a", 31.0, 1.0), ("a", 60.0, 2.0)])
    _run(spark, src, out, ckpt)
    rows = {r.session_start.timestamp(): r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 2
    extended = rows[(BASE / 1000) + 30 * 60]
    assert extended.n == 2
    assert (extended.session_end.timestamp() - extended.session_start.timestamp()) == 6 * 60
