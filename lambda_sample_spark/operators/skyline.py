"""Pareto frontier (skyline) queries (SURVEY.md §2.8 adjunct): the
set of points no other point dominates — "best price/performance"
shortlists (cheapest part for its size class, fastest model under a
cost cap). A point is dominated when another point in its group is
no worse on both axes and strictly better on at least one.

Scale notes: the naive formulation is an all-pairs anti-join; this
implementation is the sort-based O(n log n) one — after ordering by
the minimized axis, a point is on the frontier iff its maximized
axis exceeds the running max of all STRICTLY-cheaper points (classic
sweep-line): one range-frame window + one same-price tie window,
both on the group key, no self-join ever. Dominance is transitive,
so at 100 TB the standard two-phase refinement applies on top:
partition-local skylines first (mapPartitions-free here — the same
window per partition), then the global sweep over the tiny union of
local frontiers. Groups (brand) bound each window partition; a
global ungrouped skyline would run the final sweep on one partition,
which is exactly the bounded-survivor second phase.

Tie semantics: duplicate (price, size) points all survive (neither
strictly beats the other); an equal-price point with strictly larger
size dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load_table


def pareto_front(
    df: DataFrame,
    group_col: str,
    min_col: str,
    max_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group skyline minimizing ``min_col`` and maximizing
    ``max_col``. Returns the frontier rows
    (group, id, min_col, max_col) — survivors of the sweep: better
    on the maximized axis than every strictly-cheaper point, and the
    best (max) among points tied on the minimized axis."""
    # collapse to one row per distinct price level first: on the
    # level table a ROWS ..-1 frame means exactly "strictly cheaper"
    # (a RANGE -1 frame on the raw rows would be a VALUE offset —
    # points less than one price unit apart would escape the sweep)
    levels = df.groupBy(group_col, min_col).agg(
        F.max(max_col).alias("_lvl")
    )
    sweep = (
        Window.partitionBy(group_col)
        .orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    levels = levels.withColumn("_msc", F.max("_lvl").over(sweep))
    return (
        df.select(group_col, id_col, min_col, max_col)
        .join(levels, [group_col, min_col])
        .where(
            (F.col("_msc").isNull() | (F.col("_msc") < F.col(max_col)))
            & (F.col("_lvl") == F.col(max_col))
        )
        .select(group_col, id_col, min_col, max_col)
    )


def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): per-brand price/size frontier of the
    part catalog (cheapest part at or above every size level)."""
    return pareto_front(
        load_table(spark, sf_dir, "part"),
        group_col="p_brand",
        min_col="p_retailprice",
        max_col="p_size",
        id_col="p_partkey",
    )


# the oracle states dominance DIRECTLY (NOT EXISTS a dominator), so a
# sweep-formulation bug cannot hide in a mirrored oracle
_PARETO_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""

QUERIES: dict = {}

QUERIES_TAIL = {"q_pareto_front": q_pareto_front}

ORACLE = {"q_pareto_front": _PARETO_ORACLE}
