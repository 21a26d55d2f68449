"""Streaming leg of the drift family (X19 + X10 composition): the
monitoring shape a live ingest pipeline runs — per-window category
censuses on the stream, JSD scoring against a reference mix on the
read side.

Speed-layer split, the same design as the windowed HLL/CMS sketches
(streaming/watermark.py): COUNTS are the persisted unit because they
are mergeable (two partial censuses of a window add; two JSD scores
do not), so the stream persists watermarked tumbling-window
(window, category, cnt) rows and the batch leg scores any window —
or any UNION of windows, re-aggregated first — against the reference
census with the exact term math of the batch operator
(operators/drift.jsd_from_counts). State is bounded by (open windows
x categories), independent of event volume; the append-mode sink
emits each window once, when the watermark closes it.

100 TB: the census is a partial-aggregated count on (window, cat) —
the minimal shuffle any frequency monitor pays; scoring joins the
tiny category grid, nothing scans raw history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.drift import jsd_from_counts


def windowed_category_counts(
    stream: DataFrame,
    cat_col: str = "event_type",
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window category census over an event-time
    stream: one (win_start, category, cnt) row per closed window, in
    append mode (each window emitted exactly once; late rows beyond
    the watermark are dropped — the X10 contract). The output is the
    MERGEABLE drift unit: sum partial counts to coarsen windows."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(cat_col))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), cat_col, "cnt")
    )


def score_windows_vs_reference(
    window_counts: DataFrame,
    reference_counts: DataFrame,
    cat_col: str = "event_type",
) -> DataFrame:
    """Score every persisted window census against one reference mix:
    (win_start, jsd, n_ref, n_cur) per window, via the batch
    operator's exact JSD math. ``reference_counts`` is (cat, cnt) —
    typically the training corpus' category census, or a trusted
    period's windows re-aggregated."""
    cur = window_counts.select(
        F.col("win_start").alias("_k"), F.col(cat_col), F.col("cnt").alias("c_cnt")
    )
    # one reference row per window key: cross the (tiny) reference
    # census onto the window grid so jsd_from_counts sees per-key
    # censuses on both sides
    wins = window_counts.select(F.col("win_start").alias("_k")).distinct()
    ref = wins.crossJoin(
        F.broadcast(
            reference_counts.select(F.col(cat_col), F.col("cnt").alias("r_cnt"))
        )
    )
    out = jsd_from_counts(ref, cur, key_col="_k", cat_col=cat_col)
    return out.select(
        F.col("_k").alias("win_start"), "jsd", "n_ref", "n_cur"
    )
