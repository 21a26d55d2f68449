"""Streaming leg of the incremental exact-substring scrub (X42 at
steady state, streaming form): a ``foreachBatch`` wrapper that runs
``operators/incremental_substring.scrub_batch`` on every micro-batch
and writes the scrubbed documents to a parquet sink.

foreachBatch is the right binding — the scrub is a multi-job batch
workflow (scratch materialization, index semi-join, versioned index
merge), not a single streaming operator, and foreachBatch hands each
micro-batch to exactly that kind of workflow with the stream's
exactly-once bookkeeping (the checkpoint tracks which batch ids
committed; on restart an uncommitted batch replays — and scrub_batch's
gram-count commit is a versioned-table MERGE keyed by gram, so a
replayed batch that already merged would double-count: the wrapper
therefore skips batch ids at-or-below the last committed batch id it
recorded beside the CHECKPOINT — batch ids are checkpoint-scoped, so
the marker must be too — the standard idempotent-foreachBatch
recipe). One long-lived checkpoint per source is the deployment
contract (restarts resume it; a fresh checkpoint re-delivers already-
indexed files and would double-count their grams).

State across batches lives entirely in the persisted gram-count index
(16 bytes/distinct-gram) — Spark's own streaming state store holds
NOTHING, so there is no watermark/eviction trade-off: the index
remembers passages forever, which is the semantic (the 50th copy of a
license header must be caught next month too).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def scrub_sink(
    stream: DataFrame,
    index_root: str,
    out_dir: str,
    checkpoint_dir: str,
    min_len: int = 20,
    min_count: int = 2,
    trigger_available_now: bool = True,
):
    """Start the scrub sink over a (doc_id, text) stream; returns the
    StreamingQuery. Scrubbed docs append to ``out_dir``; spans land in
    the index's scrub_log as usual."""
    from ..operators.incremental_substring import scrub_batch
    from ..operators.substring import remove_dup_spans

    # batch ids are CHECKPOINT-scoped (a fresh checkpoint restarts at
    # 0), so the idempotence marker must live beside the checkpoint,
    # not the index — an index-global marker would silently skip the
    # first batches of any later run
    marker = checkpoint_dir.rstrip("/") + "_scrub_marker"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # idempotence across restarts: a replayed (already-merged)
        # batch must not re-merge its gram counts
        try:
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return
        except FileNotFoundError:
            pass
        docs = batch_df.select("doc_id", "text")
        if not docs.take(1):
            return
        spans = scrub_batch(
            spark, index_root, docs, min_len=min_len, min_count=min_count
        )
        remove_dup_spans(docs, spans).write.mode("append").parquet(out_dir)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, marker)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
