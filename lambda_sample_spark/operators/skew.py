"""Skew mitigation utilities: salted aggregation and salted join.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; these explicit formulations are for the two cases AQE can't
fix: (a) a skewed groupBy whose single hot reducer stalls the stage,
(b) a skewed shuffle join where one side must be replicated.

  - salted_agg: two-level aggregation — first on (key, salt) so the
    hot key's rows spread across SALT_N reducers, then a tiny second
    agg merges the partials. Works for any algebraic aggregate
    (sum/count/min/max; avg = sum+count merged at level 2).
  - salted_join: explode the dimension side SALT_N times with a salt
    column, salt the fact side with pmod(rand-free hash) — every hot
    fact key spreads over SALT_N reducers while each dimension row is
    replicated only SALT_N times. Deterministic (hash-based salt, no
    rand()) so results are stable and testable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_N = 8


def heavy_hitters(df: DataFrame, col: str, min_share: float = 0.01) -> DataFrame:
    """Keys owning at least ``min_share`` of all rows — the detection
    step that decides WHERE salting/skew handling is needed (hot
    tokens, hot join keys, hot sensors). Exact two-level plan: one
    hash aggregate (map-side combined) + a broadcast scalar total;
    output is bounded by 1/min_share rows regardless of input size.
    For the sketch-only regime (key cardinality too large even for the
    counted aggregate), ``df.stat.freqItems([col], min_share)`` is the
    one-pass approximate variant — same contract, false positives
    possible, no shuffle."""
    counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("cnt") / F.col("total"))
        .where(F.col("share") >= min_share)
        .select(col, "cnt", F.round("share", 6).alias("share"))
    )


def _salt_of(*cols: str | Column) -> Column:
    """Deterministic per-row salt in [0, SALT_N): hash of the row's
    distinguishing columns — no rand(), so retries/replays are stable."""
    return F.pmod(F.xxhash64(*cols), F.lit(SALT_N)).cast("int")


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_cols: list[str],
) -> DataFrame:
    """Two-level sum/count/avg on a skewed key: level 1 aggregates
    (key, salt) partials, level 2 merges them. Returns
    (key, n, total, avg_value)."""
    lvl1 = (
        df.withColumn("_salt", _salt_of(*salt_cols))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(value).alias("_sum"))
    )
    return (
        lvl1.groupBy(key)
        .agg(F.sum("_n").alias("n"), F.sum("_sum").alias("total"))
        .select(
            key,
            "n",
            F.round("total", 2).alias("total"),
            F.round(F.col("total") / F.col("n"), 6).alias("avg_value"),
        )
    )


def q_salted_agg(spark, sf_dir: str) -> DataFrame:
    """Contract (tail, round-8 promotion): the skew-safe two-level
    aggregate over events — level 1 on (event_type, salt-of-event_id)
    partials, level 2 merges. The oracle is the PLAIN single-level
    GROUP BY: salting must be result-invariant (count/sum partials are
    associative), and the hash check proves exactly that."""
    from ..io import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    return salted_agg(ev, "event_type", "value", ["event_id"])


ORACLE = {
    "q_salted_agg": """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total,
       round(sum(value) / count(*), 6) AS avg_value
FROM events GROUP BY event_type
""",
}

QUERIES: dict = {}

# round-8 promotion (appends after the frozen first-50 window)
QUERIES_TAIL = {
    "q_salted_agg": q_salted_agg,
}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_distinct_cols: list[str],
) -> DataFrame:
    """Inner equi-join where ``fact`` is skewed on ``key``: the dim side
    is exploded SALT_N ways so each (key, salt) bucket meets exactly one
    replica, and the fact's hot key fans across SALT_N reducers."""
    salted_fact = fact.withColumn("_salt", _salt_of(*fact_distinct_cols))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")
