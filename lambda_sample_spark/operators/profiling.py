"""Column profiling / data-quality metrics (SURVEY.md §2.8 adjunct):
the Deequ-style validation pass a pipeline runs on every ingested
partition before letting it near training — completeness (null
share), distinctness, and per-column numeric/string extents, emitted
as one long-format metrics table.

Reference anchor: the reference validates payloads structurally at
ingest (Consumer's JSON decode drops malformed entries); this is the
statistical upgrade of that gate for batch corpora.

Scale notes: ONE wide aggregate over the corpus computes every
metric (profiled columns are a fixed list, so the aggregate's width
is constant), then a single stack() unpivots the one-row result —
the corpus is scanned exactly once and nothing after the aggregate
exceeds n_profiled_columns rows. Unioning per-column selects instead
would duplicate the aggregate subtree per column (the adaptive-plan
multi-consumer trap). The exact count(DISTINCT) metrics expand the
scan n_distinct-columns-fold before the partial aggregate; the
production twin swaps them for approx_count_distinct (one pass, no
expand, ±2%) — the contract row keeps exact counts for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import r6
from ..io import load_table

PROFILE_NUMERIC = ("o_custkey", "o_totalprice")
PROFILE_STRING = ("o_orderstatus", "o_orderpriority")


def profile(
    df: DataFrame,
    numeric_cols: tuple[str, ...],
    string_cols: tuple[str, ...],
    exact_distinct: bool = True,
) -> DataFrame:
    """Long-format profile: one row per profiled column with
    (column, n_rows, n_null, n_distinct, completeness, mean,
    min_num, max_num, min_str, max_str). Numeric columns carry
    mean/min_num/max_num (string slots NULL) and vice versa. Means
    accumulate per-term in exact DECIMAL(28,10) (the tpch_q9 idiom)
    so the double division replays cell-exact cross-engine."""
    cols = (*numeric_cols, *string_cols)
    if exact_distinct:
        # Manual two-level distinct (round 15, guide §2.3/§4): the
        # single wide aggregate mixed exact count_distinct (rewritten
        # via a 5x Expand) with min/max over STRINGS, whose var-length
        # buffers force every aggregation level into SortAggregate —
        # the partial level then SORTS the full expanded stream
        # (measured 2.7 s vs 1.0 s for the same aggregate without the
        # string extents at sf0.1). Instead: explode one typed struct
        # per profiled column per row (exactly Expand's rows minus the
        # gid-0 replica), HASH-aggregate on (col, values) — string
        # GROUP KEYS are hash-friendly, only string BUFFERS are not —
        # then one keyless aggregate over the deduped (col, value,
        # cnt) table computes every metric: counts/sums weight by cnt
        # (exact DECIMAL arithmetic is associative, so the per-group
        # weighted sum equals the per-row sum bit-for-bit), extents
        # and distinct counts read the deduped values directly. The
        # keyless SortAggregate that remains has no grouping key to
        # sort by and sees only the deduped rows.
        fields = {c: df.schema[c].dataType.simpleString() for c in cols}
        structs = []
        for c in cols:
            parts = [F.lit(c).alias("pcol")]
            for k in cols:
                v = F.col(k) if k == c else F.lit(None).cast(fields[k])
                parts.append(v.alias(f"v_{k}"))
            structs.append(F.struct(*parts))
        lvl1 = (
            df.select(F.explode(F.array(*structs)).alias("g"))
            .select("g.*")
            .groupBy("pcol", *[f"v_{c}" for c in cols])
            .agg(F.count("*").alias("cnt"))
        )
        pcol = F.col("pcol")
        first = cols[0]
        aggs = [
            F.coalesce(
                F.sum(F.when(pcol == first, F.col("cnt"))), F.lit(0)
            ).alias("n_rows")
        ]
        for c in cols:
            val = F.col(f"v_{c}")
            on_c = (pcol == c) & val.isNotNull()
            aggs.append(
                F.coalesce(
                    F.sum(F.when(on_c, F.col("cnt"))), F.lit(0)
                ).alias(f"nn_{c}")
            )
            aggs.append(
                F.coalesce(
                    F.sum(F.when(on_c, F.lit(1))), F.lit(0)
                ).alias(f"nd_{c}")
            )
        for c in numeric_cols:
            val = F.col(f"v_{c}")
            on_c = pcol == c
            aggs.append(
                F.sum(
                    F.when(
                        on_c, val.cast("decimal(28,10)") * F.col("cnt")
                    )
                ).alias(f"s1_{c}")
            )
            aggs.append(
                F.min(F.when(on_c, val)).cast("double").alias(f"mn_{c}")
            )
            aggs.append(
                F.max(F.when(on_c, val)).cast("double").alias(f"mx_{c}")
            )
        for c in string_cols:
            val = F.col(f"v_{c}")
            on_c = pcol == c
            aggs.append(F.min(F.when(on_c, val)).alias(f"mns_{c}"))
            aggs.append(F.max(F.when(on_c, val)).alias(f"mxs_{c}"))
        wide = lvl1.agg(*aggs)
    else:
        aggs = [F.count("*").alias("n_rows")]
        for c in cols:
            aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
            aggs.append(F.approx_count_distinct(c).alias(f"nd_{c}"))
        for c in numeric_cols:
            aggs.append(
                F.sum(F.col(c).cast("decimal(28,10)")).alias(f"s1_{c}")
            )
            aggs.append(F.min(F.col(c)).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"mx_{c}"))
        for c in string_cols:
            aggs.append(F.min(F.col(c)).alias(f"mns_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"mxs_{c}"))
        wide = df.agg(*aggs)

    parts: list[str] = []
    for c in numeric_cols:
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, "
            f"round(cast(s1_{c} as double) / nn_{c}, 6), "
            f"mn_{c}, mx_{c}, cast(null as string), cast(null as string)"
        )
    for c in string_cols:
        parts.append(
            f"'{c}', nn_{c}, nd_{c}, cast(null as double), "
            f"cast(null as double), cast(null as double), mns_{c}, mxs_{c}"
        )
    n = len(parts)
    stacked = wide.selectExpr(
        "n_rows",
        f"stack({n}, {', '.join(parts)}) as "
        "(column, n_notnull, n_distinct, mean, min_num, max_num, "
        "min_str, max_str)",
    )
    return stacked.select(
        "column",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        (F.col("n_rows") - F.col("n_notnull"))
        .cast("bigint")
        .alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        r6(F.col("n_notnull").cast("double") / F.col("n_rows")).alias(
            "completeness"
        ),
        "mean",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )


def q_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 9): profile of the orders table over two
    numeric + two categorical columns."""
    return profile(
        load_table(spark, sf_dir, "orders"), PROFILE_NUMERIC, PROFILE_STRING
    )


def _col_select(c: str, numeric: bool) -> str:
    common = (
        f"SELECT '{c}' AS \"column\", n_rows, n_rows - nn_{c} AS n_null, "
        f"nd_{c} AS n_distinct, "
        f"round(CAST(nn_{c} AS DOUBLE) / n_rows, 6) AS completeness, "
    )
    if numeric:
        return common + (
            f"round(CAST(s1_{c} AS DOUBLE) / nn_{c}, 6) AS mean, "
            f"mn_{c} AS min_num, mx_{c} AS max_num, "
            "CAST(NULL AS VARCHAR) AS min_str, "
            "CAST(NULL AS VARCHAR) AS max_str FROM a"
        )
    return common + (
        "CAST(NULL AS DOUBLE) AS mean, CAST(NULL AS DOUBLE) AS min_num, "
        f"CAST(NULL AS DOUBLE) AS max_num, mns_{c} AS min_str, "
        f"mxs_{c} AS max_str FROM a"
    )


_PROFILE_ORACLE = (
    """
WITH a AS (
  SELECT count(*) AS n_rows,
"""
    + ",\n".join(
        f"         count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}"
        for c in (*PROFILE_NUMERIC, *PROFILE_STRING)
    )
    + ",\n"
    + ",\n".join(
        f"         sum(CAST({c} AS DECIMAL(28,10))) AS s1_{c}, "
        f"CAST(min({c}) AS DOUBLE) AS mn_{c}, "
        f"CAST(max({c}) AS DOUBLE) AS mx_{c}"
        for c in PROFILE_NUMERIC
    )
    + ",\n"
    + ",\n".join(
        f"         min({c}) AS mns_{c}, max({c}) AS mxs_{c}"
        for c in PROFILE_STRING
    )
    + """
  FROM orders
)
"""
    + "\nUNION ALL\n".join(
        [_col_select(c, True) for c in PROFILE_NUMERIC]
        + [_col_select(c, False) for c in PROFILE_STRING]
    )
)

# --- constraint checks over the profile ---------------------------------

# (check name, column, metric, op, threshold) — the Deequ Check shape.
# Metrics address the profile's long-format columns; ops: ge / le / eq.
DEFAULT_CHECKS: list[tuple[str, str, str, str, float]] = [
    ("custkey_complete", "o_custkey", "completeness", "ge", 1.0),
    ("price_nonnegative", "o_totalprice", "min_num", "ge", 0.0),
    ("status_low_card", "o_orderstatus", "n_distinct", "le", 3.0),
    ("priority_card", "o_orderpriority", "n_distinct", "eq", 5.0),
    ("price_mean_bound", "o_totalprice", "mean", "le", 200000.0),
]

_METRICS = ("completeness", "n_distinct", "mean", "min_num", "max_num")


def check_constraints(
    profile_df: DataFrame,
    checks: list[tuple[str, str, str, str, float]] = DEFAULT_CHECKS,
) -> DataFrame:
    """Deequ-style verification: evaluate declarative constraints over
    an already-computed :func:`profile` frame — the VERIFY half of the
    profile/verify pair (Deequ's Check.run over its AnalyzerContext).
    One row per check: (check, column, metric, value 6dp, threshold,
    passed BIGINT). Costs nothing beyond the profile itself: the rule
    table is a broadcast literal frame joined to the ≤ n_columns
    profile — no extra corpus pass, which is the point of checking
    against sufficient statistics instead of re-scanning per rule.

    A rule naming a column the profile doesn't carry (typo, or a
    column outside the profiled set) is reported as FAILED with a NULL
    value, never silently dropped — Deequ's un-evaluable-constraint
    behavior (review catch: the first cut inner-joined and a typo'd
    rule vanished, letting all(passed) conclude a pass)."""
    spark = profile_df.sparkSession
    bad = [c for c in checks if c[2] not in _METRICS or c[3] not in
           ("ge", "le", "eq")]
    if bad:
        raise ValueError(f"unsupported metric/op in checks: {bad}")
    rules = spark.createDataFrame(
        [(n, c, m, o, float(t)) for n, c, m, o, t in checks],
        "check string, column string, metric string, op string, "
        "threshold double",
    )
    value = (
        F.when(F.col("metric") == "completeness", F.col("completeness"))
        .when(
            F.col("metric") == "n_distinct",
            F.col("n_distinct").cast("double"),
        )
        .when(F.col("metric") == "mean", F.col("mean"))
        .when(F.col("metric") == "min_num", F.col("min_num"))
        .when(F.col("metric") == "max_num", F.col("max_num"))
    )
    passed = (
        F.when(F.col("op") == "ge", F.col("value") >= F.col("threshold"))
        .when(F.col("op") == "le", F.col("value") <= F.col("threshold"))
        .otherwise(F.col("value") == F.col("threshold"))
    )
    return (
        F.broadcast(rules)
        .join(profile_df, "column", "left")
        .withColumn("value", value)
        .select(
            "check",
            "column",
            "metric",
            r6(F.col("value")).alias("value"),
            "threshold",
            # NULL value (missing column or NULL metric) fails loudly
            F.coalesce(passed.cast("bigint"), F.lit(0)).alias("passed"),
        )
    )


def q_data_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail, round 10): the default constraint set verified
    against the orders profile — completeness, cardinality bounds, and
    numeric-range/mean rules, each PASS/FAIL replayed by DuckDB over
    the identical profile CTE (comparisons run on the RAW metric; the
    6dp rounding is display-only)."""
    return check_constraints(
        profile(
            load_table(spark, sf_dir, "orders"),
            PROFILE_NUMERIC,
            PROFILE_STRING,
        )
    )


def _checks_oracle() -> str:
    vals = ",\n    ".join(
        f"('{n}', '{c}', '{m}', '{o}', CAST({t!r} AS DOUBLE))"
        for n, c, m, o, t in DEFAULT_CHECKS
    )
    return rf"""
WITH prof AS ({_PROFILE_ORACLE}),
rules("check", "column", metric, op, threshold) AS (
  VALUES
    {vals}
),
joined AS (
  SELECT r."check", r."column", r.metric, r.op, r.threshold,
         CASE r.metric
           WHEN 'completeness' THEN p.completeness
           WHEN 'n_distinct' THEN CAST(p.n_distinct AS DOUBLE)
           WHEN 'mean' THEN p.mean
           WHEN 'min_num' THEN p.min_num
           WHEN 'max_num' THEN p.max_num
         END AS value
  FROM rules r LEFT JOIN prof p ON p."column" = r."column"
)
SELECT "check", "column", metric,
       round(value, 6) AS value,
       threshold,
       CAST(COALESCE(CASE op WHEN 'ge' THEN value >= threshold
                             WHEN 'le' THEN value <= threshold
                             ELSE value = threshold END,
                     FALSE) AS BIGINT) AS passed
FROM joined
"""


QUERIES: dict = {}

QUERIES_TAIL = {
    "q_data_profile": q_data_profile,
    "q_data_checks": q_data_checks,
}

ORACLE = {
    "q_data_profile": _PROFILE_ORACLE,
    "q_data_checks": _checks_oracle(),
}
