"""Anomaly-scoring column expressions.

Semantics follow the reference's heuristic scorer
(/root/reference/src/main/scala/analyzer/Analyzer.scala:47-59) and
weighted ensemble (Analyzer.scala:143-150), re-expressed as pure Spark
column arithmetic so the whole score stays inside whole-stage codegen —
no UDF anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clamp01(c: Column) -> Column:
    """Clamp to [0, 1] (Analyzer.scala:58 ``anomaly.max(0).min(1)``)."""
    return F.least(F.greatest(c, F.lit(0.0)), F.lit(1.0))


def heuristic_score(latest: Column, avg: Column, sd_pop: Column) -> Column:
    """``(|latest - avg| - sd) / (2 * sd)`` clamped to [0, 1].

    Population std-dev (divides by n — Analyzer.scala:51-52), NOT the
    sample one. NULL when sd == 0 (the reference would divide by zero).
    """
    raw = (F.abs(latest - avg) - sd_pop) / (F.lit(2.0) * sd_pop)
    return F.when(sd_pop == 0, F.lit(None).cast("double")).otherwise(clamp01(raw))


def weighted_ensemble(fast: Column, full: Column) -> Column:
    """``(35*fast + 65*full) / 100`` with fallback to ``fast`` when the
    model score is absent (Analyzer.scala:143-147)."""
    return F.when(full.isNull(), fast).otherwise(
        (F.lit(35.0) * fast + F.lit(65.0) * full) / F.lit(100.0)
    )
