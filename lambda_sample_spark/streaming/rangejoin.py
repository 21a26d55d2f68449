"""Streaming incident-window flagging: the streaming twin of the
batch bin-bucketed interval join (operators/rangejoin.py X26) — tag
events as they arrive when they fall inside any known incident /
maintenance window.

Shape: a STREAM-STATIC left-semi join. The interval table (bounded:
incident registries are small relative to the event stream) is
exploded over time bins exactly as in the batch operator, and the
stream equi-joins it on the bin with the residual range check — a
stateless per-batch hash join, so there is NO streaming state at all:
no watermark requirement, no state store, nothing to evict. Each
micro-batch pays one broadcast of the (re-read) interval side, which
also means interval-table updates between micro-batches are picked up
automatically when the static side is backed by a live table.

The batch/stream equivalence is structural (same join, same residual
predicate), and pinned in tests/test_stream_rangejoin.py: replaying a
corpus through availableNow yields exactly the batch operator's rows.

100 TB notes: for interval sides too big to broadcast the same plan
degrades to a shuffled equi join per micro-batch — still stateless;
if intervals arrive as a STREAM instead, that is the time-bounded
stream-stream join already covered by streaming/watermark.py (X10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.rangejoin import BIN_MS


def flag_stream_in_intervals(
    stream: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start: str = "s",
    end: str = "e",
    bin_ms: int = BIN_MS,
) -> DataFrame:
    """Rows of ``stream`` whose ``probe_ts`` (epoch ms) lies inside
    ANY static ``[start, end]`` interval. Stream columns pass through
    unchanged (LEFT SEMI); safe in append mode with no watermark —
    the join is stateless."""
    iv = intervals.select(
        F.col(start).alias("_s"), F.col(end).alias("_e")
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / bin_ms), F.floor(F.col("_e") / bin_ms)
            )
        ),
    )
    pb = stream.withColumn("_bin", F.floor(F.col(probe_ts) / bin_ms))
    return pb.join(
        iv,
        (pb["_bin"] == iv["_bin"])
        & (pb[probe_ts] >= iv["_s"])
        & (pb[probe_ts] <= iv["_e"]),
        "left_semi",
    ).drop("_bin")
