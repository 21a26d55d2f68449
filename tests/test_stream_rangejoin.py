"""Streaming incident-window flagging: stateless stream-static
semi-join semantics — replaying a corpus through availableNow yields
exactly the batch interval join's rows, across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.rangejoin import interval_semi_join
from lambda_sample_spark.streaming.rangejoin import flag_stream_in_intervals


def _events(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, t BIGINT")


def _run(spark, src, out, ckpt, iv):
    stream = spark.readStream.schema("id BIGINT, t BIGINT").parquet(src)
    q = (
        flag_stream_in_intervals(stream, iv, "t")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_matches_batch_across_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    iv = spark.createDataFrame(
        [(100_000, 400_000), (900_000, 1_200_000)], "s BIGINT, e BIGINT"
    )
    batch1 = [(1, 50_000), (2, 100_000), (3, 250_000), (4, 400_001)]
    batch2 = [(5, 950_000), (6, 1_200_000), (7, 1_300_000)]

    _events(spark, batch1).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt, iv)
    _events(spark, batch2).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt, iv)

    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [2, 3, 5, 6]

    # equivalence with the batch operator over the union of batches
    batch_ids = sorted(
        r["id"]
        for r in interval_semi_join(
            _events(spark, batch1 + batch2), iv, "t", "s", "e"
        ).collect()
    )
    assert got == batch_ids


def test_no_state_store_is_used(spark, tmp_path):
    """The join is stateless: the checkpoint must not grow a state/
    directory (state stores appear there the moment any stateful
    operator runs)."""
    import os

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    iv = spark.createDataFrame([(0, 1000)], "s BIGINT, e BIGINT")
    _events(spark, [(1, 500)]).write.mode("append").parquet(src)
    _run(spark, src, out, ckpt, iv)
    assert not os.path.isdir(os.path.join(ckpt, "state"))
