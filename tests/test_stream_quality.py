"""Streaming quality filter (streaming/quality.py): two file-stream
waves scored against a persisted NB model — routing matches the batch
operator exactly, the metrics audit rows land per batch, and a
replayed batch id overwrites rather than duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.classifier import score_nb, train_nb
from lambda_sample_spark.streaming.quality import quality_sink
from tests.test_classifier import _planted_docs

SCHEMA = "doc_id bigint, text string"


def _fit_model(spark, tmp_path) -> str:
    planted = _planted_docs(spark, n_docs=200)
    weights, consts = train_nb(planted, F.col("y") == 1, n=1)
    model_dir = str(tmp_path / "model")
    weights.write.parquet(f"{model_dir}/weights")
    consts.write.parquet(f"{model_dir}/consts")
    return model_dir


def test_stream_routing_matches_batch_scoring(spark, tmp_path):
    model_dir = _fit_model(spark, tmp_path)
    arrivals = _planted_docs(spark, n_docs=260).where("doc_id >= 200")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")

    # two waves over ONE long-lived checkpoint
    arrivals.where("doc_id < 230").select("doc_id", "text").write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = quality_sink(stream, model_dir, out, str(tmp_path / "ckpt"), n=1)
    q.awaitTermination(120)
    arrivals.where("doc_id >= 230").select("doc_id", "text").write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = quality_sink(stream, model_dir, out, str(tmp_path / "ckpt"), n=1)
    q.awaitTermination(120)

    kept = spark.read.parquet(f"{out}/keep/*")
    quar = spark.read.parquet(f"{out}/quarantine/*")
    assert kept.count() + quar.count() == 60

    # routed scores equal the batch operator's on the same model
    w = spark.read.parquet(f"{model_dir}/weights")
    c = spark.read.parquet(f"{model_dir}/consts")
    batch = score_nb(
        arrivals.select("doc_id", "text"), w, c, n=1
    ).collect()
    expect_keep = {r["doc_id"] for r in batch if r["logodds"] > 0}
    got_keep = {r["doc_id"] for r in kept.collect()}
    assert got_keep == expect_keep
    stream_scores = {
        r["doc_id"]: r["logodds"]
        for r in kept.unionByName(quar).collect()
    }
    for r in batch:
        assert stream_scores[r["doc_id"]] == r["logodds"]

    # planted labels: the positive class should dominate the keep side
    labels = {r["doc_id"]: r["y"] for r in arrivals.collect()}
    acc = sum(
        1
        for d, lab in labels.items()
        if (d in got_keep) == (lab == 1)
    ) / len(labels)
    assert acc >= 0.9, f"routing accuracy {acc}"

    # per-batch metrics audit rows exist and add up
    metrics = spark.read.parquet(f"{out}/metrics/*")
    rows = metrics.collect()
    assert sum(r["n_docs"] for r in rows) == 60
    assert sum(r["n_keep"] for r in rows) == len(got_keep)


def test_replayed_batch_overwrites_not_duplicates(spark, tmp_path):
    model_dir = _fit_model(spark, tmp_path)
    docs = _planted_docs(spark, n_docs=20).select("doc_id", "text")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    docs.write.mode("append").parquet(src)

    # same data through TWO fresh checkpoints: batch id 0 repeats, and
    # the batch=0 directories must be overwritten, not appended
    for ck in ("ck1", "ck2"):
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = quality_sink(stream, model_dir, out, str(tmp_path / ck), n=1)
        q.awaitTermination(120)
    routed = spark.read.parquet(f"{out}/keep/*").count() + spark.read.parquet(
        f"{out}/quarantine/*"
    ).count()
    assert routed == 20
