"""Event-time windowed aggregation with watermarked late-data handling.

The reference has NO event time — processing-time timers only, late
data harmless because the store is keyed/upserted (SURVEY.md §2.6).
At pipeline scale that is not enough: an engine ingesting from
replayable logs needs event-time windows whose state can be evicted.
This module is that piece: tumbling event-time windows with a
watermark bounding how late a row may arrive.

Scale notes: the watermark is what makes unbounded-stream state finite
— windows older than (max event time - delay) finalize, emit (append
mode), and their state is evicted; rows arriving below the watermark
are dropped instead of growing state forever. Window state is
hash-partitioned by (window, key) across executors and checkpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    entries_stream: DataFrame,
    window: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Tumbling event-time window counts per sensor; rows later than
    ``watermark_delay`` behind the max seen event time are dropped and
    closed windows emit exactly once (append mode)."""
    return (
        entries_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("w"), "sensor")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "sensor",
            "n",
            "avg_value",
        )
    )


def session_counts(
    entries_stream: DataFrame,
    gap: str = "5 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Gap-based session windows per sensor — the streaming twin of the
    batch sessionize operator (operators/sessions.py: lag → flag →
    running sum): ``F.session_window`` merges rows whose event times
    fall within ``gap`` of each other into one growing window. A
    session's state lives until the watermark passes its close
    (last event + gap), then it emits once (append mode) and is
    evicted — bounded state on an unbounded stream."""
    return (
        entries_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "sensor")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "sensor",
            "n",
            "avg_value",
        )
    )


def start_session_counts(
    entries_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "5 minutes",
    watermark_delay: str = "5 minutes",
):
    """Run the session aggregate to a parquet sink in append mode —
    only watermark-closed sessions are ever written."""
    return (
        session_counts(entries_stream, gap, watermark_delay)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "sensor",
    max_lag: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: right rows join left rows
    of the same key whose event time is within [left.ts, left.ts +
    max_lag] — the click-follows-view shape. Both sides carry
    watermarks and the join condition bounds event-time distance, so
    each side's buffered state is evicted once the other side's
    watermark passes the bound — bounded state on two unbounded
    streams (the unbridled stream-stream join would buffer forever).
    """
    l = (
        left.withWatermark("ts", watermark_delay)
        .select(
            F.col(key).alias("k"),
            F.col("ts").alias("l_ts"),
            F.col("value").alias("l_value"),
        )
    )
    r = (
        right.withWatermark("ts", watermark_delay)
        .select(
            F.col(key).alias("rk"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("r_value"),
        )
    )
    return l.join(
        r,
        F.expr(
            f"k = rk AND r_ts >= l_ts AND r_ts <= l_ts + interval {max_lag}"
        ),
        "inner",
    ).select("k", "l_ts", "r_ts", "l_value", "r_value")


def start_windowed_counts(
    entries_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark_delay: str = "5 minutes",
):
    """Run the windowed aggregate to a parquet sink in append mode —
    only finalized (watermark-passed) windows are ever written."""
    return (
        windowed_counts(entries_stream, window, watermark_delay)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_user_sketches(
    events_stream: DataFrame,
    window: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Speed-layer continuous aggregate for COUNT(DISTINCT): per
    (window, event_type) HLL sketches of distinct users
    (``hll_sketch_agg`` — DataSketches binary, constant state per
    group), appended exactly once after the watermark closes the
    window. The sink rows carry the SKETCH alongside the estimate:
    that is the point — the batch layer can union-merge persisted
    sketches upward (day -> month, any ad-hoc date range) without
    ever touching raw events again, making this the streaming half of
    the X9 mergeable-sketch continuous-aggregate pattern
    (operators/multidim.py hll_sketch_rollup). Late rows below the
    watermark are dropped, never merged into finalized sketches."""
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "sk",
            F.hll_sketch_estimate("sk").alias("n_users"),
        )
    )


def start_user_sketches(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark_delay: str = "5 minutes",
):
    """Run the sketch aggregate to a parquet sink in append mode."""
    return (
        windowed_user_sketches(events_stream, window, watermark_delay)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def windowed_key_cms(
    keyed_stream: DataFrame,
    key_col: str,
    window: str = "10 minutes",
    watermark_delay: str = "5 minutes",
) -> DataFrame:
    """Speed-layer Count-Min cells per window — the FREQUENCY-sketch
    twin of ``windowed_user_sketches``. Each finalized window appends
    its d x w counter grid (operators/multidim.py CMS: md5 buckets,
    so the persisted cells are engine-replayable); state per window is
    bounded by the constant grid size, not by key cardinality — the
    reason a sketch belongs on an unbounded key stream at all. Cells
    are plain counters, so the batch layer merges any range of sink
    rows by cell-wise SUM (cms_merge) and point-estimates heavy
    hitters without raw data. Expansion (d rows per input row)
    happens before the shuffle; partial aggregation collapses it
    map-side."""
    from ..operators.multidim import _cms_expand

    return (
        keyed_stream.withWatermark("ts", watermark_delay)
        .select("ts", _cms_expand(key_col))
        .groupBy(F.window("ts", window), "hrow", "bucket")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "hrow",
            "bucket",
            "c",
        )
    )


def start_key_cms(
    keyed_stream: DataFrame,
    key_col: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark_delay: str = "5 minutes",
):
    """Run the CMS cell aggregate to a parquet sink in append mode."""
    return (
        windowed_key_cms(keyed_stream, key_col, window, watermark_delay)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def hash_sampled_stream(
    keyed_stream: DataFrame, rate: float, key_col: str = "event_id"
) -> DataFrame:
    """Deterministic uniform sampling on an unbounded stream — the
    speed-layer counterpart of the batch bottom-k sketch
    (operators/multidim.py). Streams can't keep a FIXED-SIZE bottom-k
    per window without per-window list state, so the streaming form
    fixes the RATE instead: a row passes iff its md5(key) falls under
    ``rate`` — a pure STATELESS filter (no aggregation state at all),
    append-mode friendly, reproducible on replay, and mergeable
    trivially (the union of two hash samples at the same rate IS the
    hash sample of the union). Downstream, the persisted sample rows
    answer quantile/distribution questions the same way the batch
    sketch does; expected sample size per window is rate * volume.

    NULL keys are EXCLUDED from the sample (md5(NULL) fails the
    threshold predicate) — deliberately matching the batch bottom-k,
    whose NULLS LAST pin keeps NULL-hash rows out of every sample; a
    caller who wants NULL-keyed rows sampled must coalesce the key
    to a sentinel first, in both layers.
    """
    # first 8 md5 hex chars as a uniform 32-bit draw
    draw = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    return keyed_stream.where(draw < F.lit(int(rate * (1 << 32))))
