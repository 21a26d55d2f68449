"""Stream-stream join (watermarked, time-bounded) and checkpointed
exactly-once resume (streaming/watermark.py, streaming/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.watermark import (
    start_windowed_counts,
    stream_stream_join,
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


def _stream(spark, path):
    return spark.readStream.schema("sensor string, ts timestamp, value double").parquet(path)


def test_stream_stream_join_time_bound(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # left "views" at +0 and +30; right "clicks" at +5 (joins the +0
    # view: within 10 min), +25 (joins nothing: 25 min after +0, 5 min
    # BEFORE +30) and +35 (joins the +30 view)
    _write(spark, lsrc, [("a", 0.0, 1.0), ("a", 30.0, 2.0)])
    _write(spark, rsrc, [("a", 5.0, 10.0), ("a", 25.0, 20.0), ("a", 35.0, 30.0)])
    q = (
        stream_stream_join(_stream(spark, lsrc), _stream(spark, rsrc))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.l_value, r.r_value) for r in spark.read.parquet(out).collect()}
    assert got == {(1.0, 10.0), (2.0, 30.0)}


def test_checkpoint_resume_no_dup_no_loss(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = start_windowed_counts(_stream(spark, src), out, ckpt)
        q.awaitTermination(120)

    # run 1 processes batch 1 (closes window [0,10) via the +20 row)
    _write(spark, src, [("a", 1.0, 1.0), ("a", 2.0, 2.0), ("a", 20.0, 9.0)])
    run()
    # run 2 RESUMES from the same checkpoint: only batch 2 is new;
    # the [0,10) window must not re-emit (no duplicates), and the
    # [20,30) window closes exactly once (no loss)
    _write(spark, src, [("a", 40.0, 7.0)])
    run()
    rows = spark.read.parquet(out).collect()
    starts = sorted(r.window_start.timestamp() - BASE / 1000 for r in rows)
    assert starts == [0.0, 20 * 60]  # each window exactly once
    by_start = {r.window_start.timestamp() - BASE / 1000: r.n for r in rows}
    assert by_start[0.0] == 2
    assert by_start[20 * 60] == 1
