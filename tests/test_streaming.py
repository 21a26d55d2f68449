"""Streaming speed-layer tests: rate-source ingest -> append log ->
last-write-wins view -> snapshot refresh with change detection."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.pipeline import (
    lww_entries,
    refresh_snapshot,
    sensor_stream,
    start_ingest,
)


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "entry"),
        str(tmp_path / "checkpoint"),
        str(tmp_path / "snapshot"),
    )


def test_ingest_and_lww_view(spark, dirs):
    entry_dir, ckpt, _ = dirs
    q = start_ingest(spark, entry_dir, ckpt, rows_per_second=50, trigger_ms=200)
    try:
        # generous deadline: micro-batches can fall behind the 200 ms
        # trigger when the suite saturates the local JVM
        deadline = time.time() + 90
        rows = 0
        while time.time() < deadline:
            time.sleep(1)
            try:
                rows = lww_entries(spark, entry_dir).count()
            except Exception:
                continue
            if rows >= 50:
                break
        assert rows >= 50, f"only {rows} rows ingested"
    finally:
        q.stop()
    view = lww_entries(spark, entry_dir)
    assert view.columns == ["sensor", "ts", "value", "anomaly"]
    # keyed-upsert contract: (sensor, ts) unique in the view
    dups = view.groupBy("sensor", "ts").count().where(F.col("count") > 1).count()
    assert dups == 0
    # regimes: normal values within bound, anomalies beyond
    bad = view.where(
        ((F.col("anomaly") == 0) & (F.abs(F.col("value")) >= 100))
        | ((F.col("anomaly") == 1) & (F.abs(F.col("value")) < 100))
    ).count()
    assert bad == 0


def test_snapshot_refresh_change_detection(spark, dirs):
    entry_dir, ckpt, snap_dir = dirs
    q = start_ingest(spark, entry_dir, ckpt, rows_per_second=50, trigger_ms=200)
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            time.sleep(1)
            try:
                if lww_entries(spark, entry_dir).count() >= 50:
                    break
            except Exception:
                continue
    finally:
        q.stop()
    assert refresh_snapshot(spark, entry_dir, snap_dir) is True
    snap = spark.read.parquet(snap_dir)
    assert set(snap.columns) == {"sensor", "ts", "fast_anomaly", "avg_anomaly"}
    assert snap.count() >= 1
    scores = [r.fast_anomaly for r in snap.collect() if r.fast_anomaly is not None]
    assert all(0.0 <= s <= 1.0 for s in scores)
    # T6: second refresh with no new data is skipped
    assert refresh_snapshot(spark, entry_dir, snap_dir) is False


def test_stream_schema(spark):
    st = sensor_stream(spark)
    assert [f.name for f in st.schema.fields] == ["sensor", "ts", "value", "anomaly"]
    assert st.isStreaming


def test_vacuum_lww_compacts_superseded_versions(spark, tmp_path):
    from pyspark.sql import functions as F

    from lambda_sample_spark.streaming.pipeline import lww_entries, vacuum_lww

    entry_dir = str(tmp_path / "entries")
    rows = [
        ("a", 1000, 1.0, 0, 0),   # superseded by batch 2
        ("a", 1000, 9.0, 1, 2),   # winner
        ("a", 2000, 5.0, 0, 1),   # sole version
        ("b", 1000, 7.0, 0, 3),
    ]
    df = spark.createDataFrame(
        [(s, t, v, a, b) for s, t, v, a, b in rows],
        "sensor STRING, ts_ms LONG, value DOUBLE, anomaly INT, batch_id LONG",
    ).select(
        "sensor", F.timestamp_millis("ts_ms").alias("ts"), "value", "anomaly", "batch_id"
    )
    df.write.mode("overwrite").parquet(entry_dir)

    before_view = lww_entries(spark, entry_dir).collect()
    nb, na = vacuum_lww(spark, entry_dir)
    after_view = lww_entries(spark, entry_dir).collect()

    assert nb == 4 and na == 3  # one superseded version dropped
    assert sorted(map(tuple, before_view)) == sorted(map(tuple, after_view))
    winner = [r for r in after_view if r.sensor == "a" and r.value == 9.0]
    assert len(winner) == 1
