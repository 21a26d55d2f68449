"""Statistical testing + association analysis (SURVEY.md §2.8
adjuncts): Welch's two-sample t-test over hash-assigned experiment
arms, and pointwise mutual information between categorical metadata
columns — the experiment-readout and feature-redundancy checks a
training-data pipeline runs next to drift monitoring (drift.py).

Reference anchor: the reference's analytics surface is per-sensor
mean/stddev sweeps (Analyzer.scala's fast analysis); these are the
two canonical *inferential* extensions of the same moment sums —
"are these two groups' means actually different" (Welch) and "are
these two labels actually independent" (PMI/MI).

Scale notes: both operators are one map-side-combined hash aggregate
over the fact table followed by arithmetic on a BOUNDED frame
(event-types x 2 arms; lang x source cells). Nothing grows with
corpus size past the first aggregate; no window, no join on the fact
table. Order-sensitive double accumulation goes through the exact
per-term DECIMAL(28,10) cast (the timeseries.py / tpch_q9 idiom) so
a DuckDB oracle replays every cell bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import documents, events, r6, r6z


def _md5_arm(key: Column, n_arms: int = 2) -> Column:
    """Deterministic experiment-arm assignment from the first md5
    word of the unit key — the repo's oracle-seam hash (replays in
    DuckDB as ('0x'||substr(md5(k),1,8))::BIGINT % n). Production
    twins use xxhash64; assignment quality is identical, only the
    cross-engine replayability differs."""
    word = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return F.pmod(word.cast("bigint"), F.lit(n_arms))


def welch_ab_test(
    ev: DataFrame,
    group_col: str = "event_type",
    unit_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Welch's unequal-variance t-test per group: units are split
    50/50 into arms A/B by the deterministic hash of ``unit_col``,
    then for each ``group_col`` the arm means are compared. Returns
    (group, n_a, n_b, mean_a, mean_b, t_stat, welch_df) — under the
    null (and here the split is a pure hash of the user id, so the
    null is true by construction) t_stat is ~Student-t distributed
    with welch_df degrees of freedom.

    Shape: ONE aggregate over the fact table (arm folded in via
    conditional sums, so both arms share the single shuffle), then
    closed-form math on the bounded per-group frame. Moment sums
    (n, Σv, Σv²) accumulate in exact DECIMAL so accumulation order
    cannot move a bit between engines."""
    arm = _md5_arm(F.col(unit_col))
    v = F.col(value_col)
    dec = lambda c: c.cast("decimal(28,10)")  # noqa: E731

    def arm_sums(a: int, tag: str) -> list[Column]:
        cond = arm == a
        return [
            F.count(F.when(cond, 1)).alias(f"n_{tag}"),
            F.sum(F.when(cond, dec(v))).alias(f"s1_{tag}"),
            F.sum(F.when(cond, dec(v * v))).alias(f"s2_{tag}"),
        ]

    g = ev.groupBy(F.col(group_col).alias("group")).agg(
        *arm_sums(0, "a"), *arm_sums(1, "b")
    )

    def stats(tag: str) -> tuple[Column, Column, Column]:
        n = F.col(f"n_{tag}").cast("double")
        mean = F.col(f"s1_{tag}").cast("double") / n
        var = (F.col(f"s2_{tag}").cast("double") - n * mean * mean) / (
            n - F.lit(1)
        )
        return n, mean, var

    n_a, mean_a, var_a = stats("a")
    n_b, mean_b, var_b = stats("b")
    sea, seb = var_a / n_a, var_b / n_b
    se2 = sea + seb
    t = (mean_a - mean_b) / F.sqrt(se2)
    df = (se2 * se2) / (
        (sea * sea) / (n_a - F.lit(1)) + (seb * seb) / (n_b - F.lit(1))
    )
    return g.select(
        "group",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        r6(mean_a).alias("mean_a"),
        r6(mean_b).alias("mean_b"),
        r6z(t).alias("t_stat"),
        r6(df).alias("welch_df"),
    )


def pmi_association(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pointwise mutual information between two categorical columns:
    for every observed (x, y) cell, pmi = ln(P(x,y) / (P(x)·P(y)))
    and the cell's mutual-information contribution
    mi_term = P(x,y)·pmi (so SUM(mi_term) is the columns' MI in
    nats — the feature-redundancy / leakage score). Returns
    (x, y, n_xy, pmi, mi_term).

    Shape: ONE hash aggregate collapses the corpus to the joint
    census; marginals and the total are then window sums OVER the
    bounded census (lazily re-aggregating them as separate branches
    would re-scan the corpus once per branch — the adaptive-plan
    multi-consumer trap; windows keep the corpus scan single).
    The log ratio is computed in doubles from exact integer counts —
    deterministic on both engines (F.log == DuckDB ln bit-for-bit on
    these inputs); counts stay BIGINT so no accumulation seam exists.
    The n_xy·N / n_x·n_y products are computed in doubles to dodge
    BIGINT overflow at the 1e10-row scale where n_xy·N exceeds 2^63.
    """
    from pyspark.sql.window import Window

    cells = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count("*").alias("n_xy"))
    joint = cells.select(
        "x",
        "y",
        "n_xy",
        F.sum("n_xy").over(Window.partitionBy("x")).alias("n_x"),
        F.sum("n_xy").over(Window.partitionBy("y")).alias("n_y"),
        F.sum("n_xy").over(Window.partitionBy()).alias("n_tot"),
    )
    p_xy = F.col("n_xy").cast("double") / F.col("n_tot")
    pmi = F.log(
        (F.col("n_xy").cast("double") * F.col("n_tot"))
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return joint.select(
        "x",
        "y",
        F.col("n_xy").cast("bigint").alias("n_xy"),
        # r6z: negative-zero pairing (common.py)
        r6z(pmi).alias("pmi"),
        r6z(p_xy * pmi).alias("mi_term"),
    )


def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): Welch t-test of event value between
    two hash-assigned user arms, one row per event_type."""
    return welch_ab_test(events(spark, sf_dir))


def q_pmi_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): PMI / MI-contribution table between
    document lang and source."""
    return pmi_association(documents(spark, sf_dir), "lang", "source")


_AB_WELCH_ORACLE = """
WITH tagged AS (
  SELECT event_type AS "group",
         (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT) % 2
           AS arm,
         value AS v
  FROM events
), g AS (
  SELECT "group",
         count(*) FILTER (WHERE arm = 0)                          AS n_a,
         sum(CASE WHEN arm = 0 THEN CAST(v AS DECIMAL(28,10)) END) AS s1_a,
         sum(CASE WHEN arm = 0 THEN CAST(v * v AS DECIMAL(28,10)) END) AS s2_a,
         count(*) FILTER (WHERE arm = 1)                          AS n_b,
         sum(CASE WHEN arm = 1 THEN CAST(v AS DECIMAL(28,10)) END) AS s1_b,
         sum(CASE WHEN arm = 1 THEN CAST(v * v AS DECIMAL(28,10)) END) AS s2_b
  FROM tagged GROUP BY 1
), m AS (
  SELECT "group",
         CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
         CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
         CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
         (CAST(s2_a AS DOUBLE) - CAST(n_a AS DOUBLE)
            * (CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE))
            * (CAST(s1_a AS DOUBLE) / CAST(n_a AS DOUBLE)))
           / (CAST(n_a AS DOUBLE) - 1) AS var_a,
         (CAST(s2_b AS DOUBLE) - CAST(n_b AS DOUBLE)
            * (CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE))
            * (CAST(s1_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
           / (CAST(n_b AS DOUBLE) - 1) AS var_b
  FROM g
)
SELECT "group",
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round((mean_a - mean_b)
             / sqrt(var_a / na + var_b / nb), 6) + CAST(0.0 AS DOUBLE) AS t_stat,
       round(((var_a / na + var_b / nb) * (var_a / na + var_b / nb))
             / ((var_a / na) * (var_a / na) / (na - 1)
                + (var_b / nb) * (var_b / nb) / (nb - 1)), 6) AS welch_df
FROM m
"""

_PMI_ORACLE = """
WITH cells AS (
  SELECT lang AS x, source AS y, count(*) AS n_xy
  FROM documents GROUP BY 1, 2
), mx AS (
  SELECT x, sum(n_xy) AS n_x FROM cells GROUP BY 1
), my AS (
  SELECT y, sum(n_xy) AS n_y FROM cells GROUP BY 1
), tot AS (
  SELECT sum(n_xy) AS n_tot FROM cells
)
SELECT c.x, c.y, CAST(c.n_xy AS BIGINT) AS n_xy,
       round(ln((CAST(c.n_xy AS DOUBLE) * n_tot)
                / (CAST(n_x AS DOUBLE) * n_y)), 6) + CAST(0.0 AS DOUBLE) AS pmi,
       round((CAST(c.n_xy AS DOUBLE) / n_tot)
             * ln((CAST(c.n_xy AS DOUBLE) * n_tot)
                  / (CAST(n_x AS DOUBLE) * n_y)), 6) + CAST(0.0 AS DOUBLE) AS mi_term
FROM cells c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot
"""

QUERIES: dict = {}

QUERIES_TAIL = {
    "q_ab_welch": q_ab_welch,
    "q_pmi_association": q_pmi_association,
}

ORACLE = {
    "q_ab_welch": _AB_WELCH_ORACLE,
    "q_pmi_association": _PMI_ORACLE,
}
