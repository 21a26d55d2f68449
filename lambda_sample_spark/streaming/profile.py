"""Streaming leg of the column-profiling family (X35 + X10
composition): per-window data-quality metric PARTIALS on the live
stream, finalized (and merged upward) on the read side — continuous
data validation at ingest, the gate that catches a broken producer
within one window instead of at the next nightly profile.

Speed-layer split, same design as the drift/HLL/CMS legs: the
persisted unit is the MERGEABLE partial — counts, null counts, exact
DECIMAL sums, min/max, and an HLL sketch for distinctness (two
partials of a window add / union; a finalized mean or completeness
ratio does not merge). Coarser windows (hour -> day) re-aggregate
the partials without touching raw events; finalization derives
completeness, mean, and the distinct estimate with the batch
operator's conventions (exact-decimal mean division, round-6).
State is bounded by open windows x metric width, independent of
event volume; append mode emits each window once on watermark close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.common import r6


def windowed_profile_partials(
    stream: DataFrame,
    value_col: str = "value",
    distinct_col: str = "user_id",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Watermarked tumbling-window profile partials: one row per
    closed window with (win_start, n_rows, n_val, s1, mn, mx,
    sk) — every column mergeable (sums add, extents min/max, the
    DataSketches HLL unions). ``n_val`` counts non-null values, so
    completeness falls out at finalize time. ``extra_keys`` adds
    grouping columns alongside the window (e.g. the serving route in
    streaming/perf.py); on a BATCH frame the watermark node is
    optimized away (EliminateEventTimeWatermark), so the same function
    profiles micro-batch flushes."""
    v = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("win"),
            *[F.col(k) for k in extra_keys],
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count(v).alias("n_val"),
            F.sum(v.cast("decimal(28,10)")).alias("s1"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
            F.hll_sketch_agg(distinct_col).alias("sk"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            *extra_keys,
            "n_rows",
            "n_val",
            "s1",
            "mn",
            "mx",
            "sk",
        )
    )


def merge_profile_partials(
    partials: DataFrame, bucket_expr=None
) -> DataFrame:
    """Re-aggregate persisted window partials upward (e.g. 10-minute
    windows -> one day bucket) WITHOUT raw data: counts and sums add,
    extents re-min/max, sketches union. ``bucket_expr`` maps
    win_start to the coarser key (default: one global bucket)."""
    key = (
        bucket_expr.alias("bucket")
        if bucket_expr is not None
        else F.lit("all").alias("bucket")
    )
    return partials.groupBy(key).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_val").alias("n_val"),
        F.sum("s1").alias("s1"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.hll_union_agg("sk").alias("sk"),
    )


def finalize_profile(partials: DataFrame) -> DataFrame:
    """Derive the human-facing metrics from partial rows (windowed or
    merged): completeness, exact-decimal mean, extents, HLL distinct
    estimate. Keeps every grouping column of the input."""
    non_metric = [
        c
        for c in partials.columns
        if c not in {"n_rows", "n_val", "s1", "mn", "mx", "sk"}
    ]
    return partials.select(
        *non_metric,
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("n_val")).cast("bigint").alias("n_null"),
        r6(F.col("n_val").cast("double") / F.col("n_rows")).alias(
            "completeness"
        ),
        r6(F.col("s1").cast("double") / F.col("n_val")).alias("mean"),
        F.col("mn").alias("min_val"),
        F.col("mx").alias("max_val"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("n_distinct_est"),
    )
