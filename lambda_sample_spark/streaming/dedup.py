"""Streaming deduplication: the streaming twin of the batch exact
dedup (operators/dedup.py X1) for ingest pipelines whose sources can
re-deliver (at-least-once brokers, replayed logs).

Two bounded-state forms:

- key dedup within a watermark: ``dropDuplicatesWithinWatermark`` —
  state for a key is held only until the watermark passes its event
  time + delay, then evicted; re-deliveries inside the window are
  dropped, arbitrarily-late re-deliveries are the upstream log's
  problem (exactly the at-least-once broker contract).
- content dedup: same operator keyed by a content hash (md5 of the
  payload), the streaming form of group-by-hash exact dedup — the
  16-byte hash is the state key, never the document body.

Scale notes: state is hash-partitioned by key across executors and
checkpointed; the watermark bound is what keeps it finite — an
unwatermarked streaming dropDuplicates grows state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_by_key(
    stream: DataFrame,
    keys: list[str],
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key within the watermark bound."""
    return stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        keys
    )


def dedup_stream_by_content(
    stream: DataFrame,
    payload_col: str,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Content-hash streaming dedup: first arrival of each distinct
    payload wins; state key is the md5, not the payload."""
    hashed = stream.withColumn(
        "_content_hash", F.md5(F.col(payload_col).cast("binary"))
    )
    return (
        hashed.withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["_content_hash"])
        .drop("_content_hash")
    )
