"""Incremental exact-substring dedup against a persisted gram-count
index (the X42 operator at steady state, mirroring X14's
incremental-minhash shape): scrub each INCOMING batch against
everything ingested so far WITHOUT re-reading or re-hashing the
corpus, then commit the batch's gram counts so the next batch sees
them.

Semantics (scrub-at-ingest — the production deployment of Lee et al.
2022): a position in a NEW doc is duplicated iff its L-gram's total
occurrence count over (all previously ingested docs + this batch)
reaches ``min_count``. Previously shipped docs are immutable — the
index exists so the Nth copy of a passage is caught the moment it
arrives. The exact equivalence this buys (pinned in tests):

    spans flagged for batch k  ==  the batch-mode
    ``duplicated_spans(B1 ∪ ... ∪ Bk)``  restricted to batch-k docs

because both sides test the same corpus-total gram count. (Batch-mode
would ALSO retro-flag earlier copies; at steady state those are
already shipped, which is exactly why ingest pipelines scrub forward.)

Per-batch cost (the 100 TB argument):
  gram the batch once (8-byte xxhash64 positions, materialized to
  scratch — the match and commit legs share it) -> batch gram counts
  (one batch-sized shuffle) -> LEFT-SEMI the index scan against the
  BROADCAST batch keys (the index never shuffles; the hit set is
  bounded by the batch's distinct grams) -> covered positions via a
  broadcast of the duplicated grams (the batch gram frame never
  shuffles either) -> per-doc span merge (one batch-sized exchange)
  -> merge-append the new totals (warehouse.merge_versioned rewrites
  ONLY the buckets the batch touches; untouched buckets carry by
  hardlink). Index rows are (gram, cnt) — 16 bytes/distinct-gram, and
  growth is sublinear in corpus bytes on template-heavy corpora
  (repeats don't add rows).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.warehouse import (
    current_version,
    merge_versioned,
    read_versioned,
    vacuum_versions,
)
from .substring import _grams

INDEX_SCHEMA = "gram BIGINT, cnt BIGINT"


def _read_index(spark: SparkSession, index_root: str) -> DataFrame:
    counts_root = os.path.join(index_root, "gram_counts")
    if current_version(counts_root) is None:
        return spark.createDataFrame([], INDEX_SCHEMA)
    return read_versioned(spark, counts_root).select("gram", "cnt")


def batch_totals(
    spark: SparkSession, index_root: str, bcnt: DataFrame
) -> DataFrame:
    """The (lazy) match core: corpus-total occurrence count per batch
    gram — (gram, total = batch count + index count). This is the plan
    to audit: the index branch must be a scan feeding a BROADCAST
    semi-join against the batch's distinct grams, never a shuffle of
    the index (the incremental_dedup match_plan invariant; the test
    asserts zero hash-partitioning exchanges in this whole subtree —
    the hit set is bounded by the batch's distinct grams, so the
    follow-up join broadcasts too)."""
    index = _read_index(spark, index_root)
    hits = index.join(
        F.broadcast(bcnt.select("gram")), "gram", "left_semi"
    )
    return bcnt.join(F.broadcast(hits), "gram", "left").select(
        "gram",
        (F.col("bcnt") + F.coalesce(F.col("cnt"), F.lit(0))).alias("total"),
    )


def scrub_batch(
    spark: SparkSession,
    index_root: str,
    new_docs: DataFrame,
    min_len: int = 20,
    min_count: int = 2,
    commit: bool = True,
    log_label: str | None = None,
    commit_meta: str | None = None,
    pre_commit=None,
) -> DataFrame:
    """Flag duplicated spans in ``new_docs`` against the accumulated
    index + the batch itself; with ``commit``, merge the batch's gram
    counts in as the next index version. Returns (doc_id, span_start,
    span_end) for the NEW docs, materialized to
    ``<index_root>/scrub_log/batch=N`` (the per-batch audit record).
    Pair with :func:`lambda_sample_spark.operators.substring.
    remove_dup_spans` to emit the scrubbed texts.

    Streaming-replay hooks (the scrub_sink exactly-once recipe):
    ``log_label`` names the scrub_log partition deterministically
    (``batch=<label>``, written with overwrite — a replayed batch
    rewrites its own log instead of appending a new one);
    ``commit_meta`` rides INSIDE the versioned index commit (see
    warehouse.version_meta) so "did this batch's merge land?" is
    answerable atomically; ``pre_commit(spans)`` runs AFTER the spans
    materialize but BEFORE the index merge — downstream effects (the
    scrubbed-output write) go there, so every replay window is safe:
    a crash before the merge replays the whole batch against an
    unchanged index (same spans, idempotent overwrite sinks), a crash
    after the merge is skipped entirely because the meta already
    records the batch and every earlier effect already ran."""
    from pyspark.sql.window import Window

    scratch = os.path.join(index_root, "_scrub_scratch")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    # gram the batch ONCE: covered-position detection and the commit
    # totals both need the positions; the hash pass over raw text is
    # the dominant per-batch CPU cost, so materialize it
    grams_path = os.path.join(scratch, "grams")
    _grams(new_docs, min_len, "hash").write.parquet(grams_path)
    grams = spark.read.parquet(grams_path)
    bcnt = grams.groupBy("gram").agg(F.count("*").alias("bcnt"))
    bcnt.write.parquet(os.path.join(scratch, "bcnt"))
    bcnt = spark.read.parquet(os.path.join(scratch, "bcnt"))

    totals = batch_totals(spark, index_root, bcnt)
    totals.write.parquet(os.path.join(scratch, "totals"))
    totals = spark.read.parquet(os.path.join(scratch, "totals"))
    dup = totals.where(F.col("total") >= min_count).select("gram")

    # covered positions: broadcast the duplicated-gram set over the
    # batch grams (dup is a subset of the batch's distinct grams — the
    # batch gram frame never shuffles), then the X42 span merge
    cov = grams.join(F.broadcast(dup), "gram").select("doc_id", "pos")
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.lag("pos").over(wd)
    new_run = F.when(
        prev.isNull() | (F.col("pos") > prev + min_len), F.lit(1)
    ).otherwise(F.lit(0))
    runs = cov.withColumn(
        "run_id",
        F.sum(new_run).over(wd.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = runs.groupBy("doc_id", "run_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(min_len - 1)).alias("span_end"),
    ).drop("run_id")

    # audit log outlives the scratch dir (the ingest_log idiom); a
    # labeled batch (streaming) overwrites ITS OWN partition on replay
    # instead of growing a new auto-numbered one
    log_dir = os.path.join(index_root, "scrub_log")
    os.makedirs(log_dir, exist_ok=True)
    label = log_label if log_label is not None else len(os.listdir(log_dir))
    final = os.path.join(log_dir, f"batch={label}")
    spans.write.mode(
        "overwrite" if log_label is not None else "errorifexists"
    ).parquet(final)
    spans = spark.read.parquet(final)

    if pre_commit is not None:
        pre_commit(spans)
    if commit:
        # new totals for every batch gram — insert-or-update; only the
        # buckets the batch touches are rewritten, the rest hardlink
        counts_root = os.path.join(index_root, "gram_counts")
        merge_versioned(
            spark,
            counts_root,
            totals.select("gram", F.col("total").alias("cnt")),
            keys=["gram"],
            meta=commit_meta,
        )
        vacuum_versions(counts_root, keep=8)
    shutil.rmtree(scratch, ignore_errors=True)
    return spans
