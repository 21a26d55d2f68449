"""Streaming leg of the model-based quality filter
(operators/classifier.py): score every arriving micro-batch of
documents against a PERSISTED NB model and route keep / quarantine —
the ingest-path shape of the classifier stage (train offline, apply
online; the model artifact is the seam between the two).

foreachBatch is the right binding, as with the substring scrub: the
step is read-model → score → route, a batch workflow per micro-batch,
and the per-batch outputs are made idempotent STRUCTURALLY — each
batch writes its routed docs and its metrics row under
``batch=<id>`` directories with overwrite, so a replayed batch
(restart from an uncommitted checkpoint offset) rewrites the same
paths instead of duplicating rows. No marker file needed: unlike the
scrub's versioned-index MERGE, scoring has no cross-batch state to
double-apply — the model is read-only.

The metrics sink is the A8-shape per-batch audit a live filter needs
(volume, keep rate, score distribution) — query it like any table;
streaming/perf.py's serving-metrics pattern, applied to data quality.

100 TB: the model broadcast is bounded (≤ B weight rows); per batch
the plan is the batch operator's own — one narrow (doc,bucket) census
shuffle; nothing accumulates in the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def route_quality(
    scored: DataFrame, out_dir: str, batch_id: int, threshold: float
) -> None:
    """The routing + audit tail every quality gate shares (this sink
    and the composed examples/streaming_curation.py): split a scored
    batch at ``threshold``, write keep / quarantine / one metrics row
    under structurally idempotent ``batch=<id>`` overwrite paths. The
    scored frame is batch-sized — persisted here for its three
    consumers instead of re-running the census shuffle per write."""
    scored = scored.persist()
    try:
        keep = scored.where(F.col("logodds") > threshold)
        quar = scored.where(~(F.col("logodds") > threshold))
        keep.write.mode("overwrite").parquet(
            f"{out_dir}/keep/batch={batch_id}"
        )
        quar.write.mode("overwrite").parquet(
            f"{out_dir}/quarantine/batch={batch_id}"
        )
        scored.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("logodds") > threshold).cast("int"))
            .cast("bigint")
            .alias("n_keep"),
            F.round(F.avg("logodds"), 6).alias("mean_logodds"),
        ).withColumn("batch_id", F.lit(batch_id).cast("bigint")).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/metrics/batch={batch_id}")
    finally:
        scored.unpersist()


def quality_sink(
    stream: DataFrame,
    model_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.0,
    n: int = 2,
    n_buckets: int = 1024,
    gram_hash: str = "xxhash64",
    trigger_available_now: bool = True,
):
    """Start the quality-routing sink over a (doc_id, text) stream;
    returns the StreamingQuery. Per batch: docs with
    ``logodds > threshold`` land under ``out_dir/keep/batch=<id>``,
    the rest under ``out_dir/quarantine/batch=<id>``, and one audit
    row (batch_id, n_docs, n_keep, mean_logodds) under
    ``out_dir/metrics/batch=<id>``. The model is loaded once per batch
    through ``classifier.load_nb_model`` — the versioned pointer-swap
    layout ``nb_commit``/``nb_update`` write (a concurrent refresh is
    safe: the batch resolves the old or the new version, never a torn
    one), with a plain-parquet fallback for hand-persisted models.
    Hot-swappable either way: commit a newer model and the next batch
    scores with it."""
    from ..operators.classifier import load_nb_model, score_nb

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        if not docs.take(1):
            return
        weights, consts = load_nb_model(spark, model_dir)
        scored = score_nb(
            docs, weights, consts, n=n, n_buckets=n_buckets,
            gram_hash=gram_hash,
        ).join(docs, "doc_id")
        route_quality(scored, out_dir, batch_id, threshold)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
