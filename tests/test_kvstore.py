"""S10 KV store: Redis-hash hset/hget semantics on a versioned,
hash-bucketed parquet table (Trainer.scala:46, HistoryWriter.scala:72)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from lambda_sample_spark.plans import audit
from lambda_sample_spark.sources import kvstore
from lambda_sample_spark.sources.warehouse import current_version


def test_hset_hget_bytes_roundtrip(spark, tmp_path):
    root = str(tmp_path / "kv")
    # non-UTF8 payloads: the value column is true BINARY, like the
    # reference's serialized model blobs
    blob_a = b"\x00\xff\x80model-bytes\x01"
    blob_b = b"\x7f\x00other"
    kvstore.hset(spark, root, "model", {"s1": blob_a, "s2": blob_b})
    assert kvstore.hget(spark, root, "model", "s1") == blob_a
    assert kvstore.hget(spark, root, "model", "s2") == blob_b
    assert kvstore.hget(spark, root, "model", "missing") is None


def test_hset_overwrite_lww_and_key_isolation(spark, tmp_path):
    root = str(tmp_path / "kv")
    kvstore.hset(spark, root, "model", {"s1": b"v1", "s2": b"keep"})
    kvstore.hset(spark, root, "snapshot", {"s1": b"snap1"})
    kvstore.hset(spark, root, "model", {"s1": b"v2"})
    # hset semantics: same (hkey, field) overwritten, siblings intact,
    # other hash keys untouched
    assert kvstore.hgetall(spark, root, "model") == {"s1": b"v2", "s2": b"keep"}
    assert kvstore.hgetall(spark, root, "snapshot") == {"s1": b"snap1"}
    # each hset committed a new version through the atomic pointer swap
    assert current_version(root) == 3


def test_hget_prunes_to_one_bucket(spark, tmp_path):
    root = str(tmp_path / "kv")
    kvstore.hset(
        spark, root, "model", {f"s{i}": bytes([i]) for i in range(64)}
    )
    from lambda_sample_spark.sources.warehouse import read_versioned, resolve_buckets

    # the table's authoritative bucket count comes from the persisted
    # _BUCKETS metadata written at creation (warehouse.resolve_buckets)
    n = resolve_buckets(root, None)
    bkt = F.pmod(
        F.xxhash64(F.lit("model"), F.lit("s7")), F.lit(n)
    ).cast("int")
    df = read_versioned(spark, root).where(F.col("_bkt") == bkt)
    plan = audit.formatted_plan(df)
    # the _bkt predicate reaches the scan as a partition filter: a
    # point read touches one bucket directory, not the whole table
    assert "PartitionFilters" in plan
    assert "_bkt" in plan.split("PartitionFilters")[1].split("]")[0]
    assert kvstore.hget(spark, root, "model", "s7") == bytes([7])


def test_foreach_batch_hset_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "kv")
    rows = [
        ("snapshot", "s1", b"old", 1),
        ("snapshot", "s2", b"b2", 2),
        ("snapshot", "s1", b"new", 3),
    ]
    spark.createDataFrame(
        rows, "hkey string, field string, value binary, seq long"
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "hkey string, field string, value binary, seq long"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            kvstore.foreach_batch_hset(root, order_col="seq")
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # within-batch LWW: newest seq per (hkey, field) wins
    assert kvstore.hgetall(spark, root, "snapshot") == {"s1": b"new", "s2": b"b2"}


def test_write_snapshot_kv_json_payload(spark, tmp_path):
    root = str(tmp_path / "kv")
    snap = spark.createDataFrame(
        [("sensor-a", 1.5, 0.25), ("sensor-b", -2.0, 0.75)],
        "sensor string, avg_value double, fast_anomaly double",
    )
    kvstore.write_snapshot_kv(spark, root, snap)
    got = kvstore.hgetall(spark, root, "snapshot")
    assert set(got) == {"sensor-a", "sensor-b"}
    payload = json.loads(got["sensor-a"].decode())
    assert payload == {"avg_value": 1.5, "fast_anomaly": 0.25}


def test_write_models_kv_trainer_shape(spark, sf_dir, tmp_path):
    # Trainer.scala:46: hset("model", sensor, serialized model). The
    # scalable histogram trainer's per-bin rows become one JSON blob
    # per event_type, assembled executor-side.
    from lambda_sample_spark.ml.forest import _labeled_events, train_per_key_pandas
    from lambda_sample_spark.operators.common import events

    root = str(tmp_path / "kv")
    models = train_per_key_pandas(_labeled_events(events(spark, sf_dir)))
    kvstore.write_models_kv(spark, root, models)
    got = kvstore.hgetall(spark, root, "model")
    keys = {r.event_type for r in models.select("event_type").distinct().collect()}
    assert set(got) == keys
    bins = json.loads(got[next(iter(keys))].decode())
    assert len(bins) > 1 and {"bin_lo"} <= set(bins[0])


def test_merge_carries_untouched_buckets_by_hardlink(spark, tmp_path):
    root = str(tmp_path / "kv")
    kvstore.hset(
        spark, root, "model", {f"s{i}": bytes([i]) for i in range(64)}
    )
    kvstore.hset(spark, root, "model", {"s0": b"upd"})
    # bounded work: the second commit rewrote only the bucket s0 lands
    # in; every other bucket's files are hardlinks into v=1 (nlink 2)
    v2 = os.path.join(root, "v=2")
    linked = rewritten = 0
    for d in os.listdir(v2):
        if not d.startswith("_bkt="):
            continue
        for fname in os.listdir(os.path.join(v2, d)):
            if fname.startswith((".", "_")):
                continue
            if os.stat(os.path.join(v2, d, fname)).st_nlink >= 2:
                linked += 1
            else:
                rewritten += 1
    assert linked > 0 and rewritten >= 1
    assert kvstore.hget(spark, root, "model", "s0") == b"upd"
    assert kvstore.hget(spark, root, "model", "s1") == bytes([1])
