"""Streaming leg of the incremental exact-substring scrub (X42 at
steady state, streaming form): a ``foreachBatch`` wrapper that runs
``operators/incremental_substring.scrub_batch`` on every micro-batch
and writes the scrubbed documents to a parquet sink.

foreachBatch is the right binding — the scrub is a multi-job batch
workflow (scratch materialization, index semi-join, versioned index
merge), not a single streaming operator, and foreachBatch hands each
micro-batch to exactly that kind of workflow with the stream's
at-least-once replay (the checkpoint tracks which batch ids committed;
on restart an uncommitted batch replays). The wrapper makes the replay
IDEMPOTENT end-to-end, with no window between effects:

  1. the scrubbed output is written under
     ``out_dir/run=<token>/batch=<id>`` with OVERWRITE — a replayed
     batch rewrites its own partition instead of appending duplicates;
  2. the gram-count MERGE records ``<token>:<id>`` INSIDE the
     versioned commit itself (warehouse.version_meta — the pointer
     swap is already atomic, so the marker and the merge land as one
     unit), and the skip check reads it back from the committed index;
  3. the output write runs BEFORE the merge (scrub_batch's
     ``pre_commit`` hook), so: crash before the merge -> the replay
     recomputes the same spans against the UNCHANGED index and
     overwrites the same output, then merges; crash after the merge
     -> the meta already names the batch, the replay skips, and every
     earlier effect already landed.

``token`` is a checkpoint-scoped run id persisted beside the
checkpoint dir — batch ids reset with a fresh checkpoint, so the skip
check must too (an index-global bare batch id would silently skip the
first batches of any later run). One long-lived checkpoint per source
is still the deployment contract (a fresh checkpoint re-delivers
already-indexed files, whose grams would then double-count).

State across batches lives entirely in the persisted gram-count index
(16 bytes/distinct-gram) — Spark's own streaming state store holds
NOTHING, so there is no watermark/eviction trade-off: the index
remembers passages forever, which is the semantic (the 50th copy of a
license header must be caught next month too).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_token(checkpoint_dir: str, suffix: str = "_scrub_token") -> str:
    """The checkpoint-scoped run id: created (atomically) beside the
    checkpoint dir on first use, stable across restarts of the SAME
    checkpoint, fresh for a new one — exactly the lifetime of the
    stream's batch-id counter."""
    path = checkpoint_dir.rstrip("/") + suffix
    try:
        with open(path) as f:
            return f.read().strip()
    except FileNotFoundError:
        token = uuid.uuid4().hex[:12]
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(token)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return token


def batch_committed(counts_root: str, token: str, batch_id: int) -> bool:
    """True iff ANY retained committed index version records this
    run's merge for ``batch_id`` (or a later one — foreachBatch
    replays only the last uncommitted batch, so ids are monotone per
    run).

    The scan covers the whole retained version history, not just the
    current pointer: if another commit lands on the same gram-counts
    index between this batch's merge and its replay (a manual
    ``scrub_batch`` without ``commit_meta``, a nightly maintenance
    merge, a second stream sharing the index), the CURRENT version's
    meta no longer names this run — but the version that carried the
    merge is still on disk, and its meta is authoritative.
    ``list_versions`` filters to versions at or below the committed
    pointer, so an orphan directory from a crash between meta write
    and pointer swap is never mistaken for a committed merge.

    Remaining contract: the marker must survive until the replay —
    i.e. the retention window (``vacuum_versions`` keep, default 8 in
    the scrub path) must exceed the number of commits that can land
    between a batch's merge and the stream checkpoint recording it.
    foreachBatch checkpoints each batch before starting the next, so
    only commits from OTHER writers in that short window count against
    the budget; 8 versions of headroom is the documented bound, not an
    assumption of a single writer."""
    from ..sources.warehouse import list_versions, version_meta

    for v in reversed(list_versions(counts_root)):
        meta = version_meta(counts_root, v)
        if meta is None:
            continue
        tok, _, bid = meta.rpartition(":")
        if tok == token and bid.isdigit() and int(bid) >= batch_id:
            return True
    return False


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
    StreamingQuery. Scrubbed docs land under
    ``out_dir/run=<token>/batch=<id>`` (overwrite — replay-safe);
    spans land in the index's scrub_log as usual."""
    from ..operators.incremental_substring import scrub_batch
    from ..operators.substring import remove_dup_spans

    counts_root = os.path.join(index_root, "gram_counts")
    token = run_token(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # idempotence across restarts: the marker rides inside the
        # versioned index commit, so "merged" implies "output written"
        # (the output write precedes the merge below)
        if batch_committed(counts_root, token, batch_id):
            return
        docs = batch_df.select("doc_id", "text")
        if not docs.take(1):
            return
        out_batch = os.path.join(
            out_dir, f"run={token}", f"batch={batch_id}"
        )

        def write_output(spans: DataFrame) -> None:
            remove_dup_spans(docs, spans).write.mode("overwrite").parquet(
                out_batch
            )

        scrub_batch(
            spark,
            index_root,
            docs,
            min_len=min_len,
            min_count=min_count,
            log_label=f"{token}-{batch_id}",
            commit_meta=f"{token}:{batch_id}",
            pre_commit=write_output,
        )

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
