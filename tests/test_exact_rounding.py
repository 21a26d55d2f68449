"""Property pins for the exact cross-engine rounding templates
(common.exact_avg6 / exact_sum6 / exact_ratio6, tpch._money_sum2):
each Spark leg must equal its DuckDB pairing cell-for-cell on
adversarial inputs — knife-edge half-ties included — because the
whole point of the integer templates is that no double-side rounding
disagreement can survive them."""

from __future__ import annotations

import random

import duckdb
import pytest

from lambda_sample_spark.operators.common import (
    EXACT_FAST_BOUND,
    exact_avg6,
    exact_avg6_sql,
    exact_avg6_wide,
    exact_avg6_wide_sql,
    exact_ratio6,
    exact_ratio6_sql,
    exact_sum6,
    exact_sum6_sql,
    exact_sum6_wide,
    exact_sum6_wide_sql,
)
from lambda_sample_spark.operators.tpch import _money_sum2, _money_sum2_sql


def _duck(sql: str):
    return duckdb.connect().execute(sql).fetchall()


def test_exact_sum6_matches_duckdb_on_halfway_ties(spark):
    """Values engineered so the 10dp sum ends exactly in 5000 at the
    7th decimal — a true round(.,6) tie — plus random 2dp noise."""
    rng = random.Random(42)
    vals = [0.0000005, 1.0000005, -2.0000005] + [
        round(rng.uniform(-100, 100), 2) for _ in range(500)
    ]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = df.agg(exact_sum6("value").alias("s")).collect()[0].s
    duck_rows = ", ".join(f"({v!r})" for v in vals)
    want = _duck(
        f"WITH t(value) AS (VALUES {duck_rows}) "
        f"SELECT {exact_sum6_sql('value')} FROM t"
    )[0][0]
    assert got == want


def test_exact_avg6_matches_duckdb_on_halfway_ties(spark):
    # 43.4728125 avg tie, the actual sf1 seam (SCALE.md round-11)
    vals = [43.472810, 43.472815] * 8
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = df.agg(exact_avg6("value").alias("a")).collect()[0].a
    duck_rows = ", ".join(f"({v!r})" for v in vals)
    want = _duck(
        f"WITH t(value) AS (VALUES {duck_rows}) "
        f"SELECT {exact_avg6_sql('value')} FROM t"
    )[0][0]
    assert got == want == 43.472813  # .4728125 rounds half-AWAY on both


@pytest.mark.parametrize(
    "num,den",
    [
        (5363, 16000),  # 0.3351875 exactly — the q_doc_profile tie class
        (1, 3),
        (167, 500),
        (0, 7),
        (2**31, 2**31 + 1),  # BIGINT-cast guard: would overflow int32 * 1e6
    ],
)
def test_exact_ratio6_matches_duckdb(spark, num, den):
    df = spark.createDataFrame([(num, den)], "num long, den long")
    got = df.select(exact_ratio6("num", "den").alias("r")).collect()[0].r
    want = _duck(
        f"WITH t(num, den) AS (VALUES ({num}, {den})) "
        f"SELECT {exact_ratio6_sql('num', 'den')} FROM t"
    )[0][0]
    assert got == want


def test_exact_wide_variants_match_duckdb_on_halfway_ties(spark):
    """The 10dp DECIMAL `_wide` pair (for corpora past the BIGINT
    fast-path bound) through the same knife-edge ties."""
    vals = [0.0000005, 1.0000005, -2.0000005, 43.472810, 43.472815]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = df.agg(
        exact_sum6_wide("value").alias("s"),
        exact_avg6_wide("value").alias("a"),
    ).collect()[0]
    duck_rows = ", ".join(f"({v!r})" for v in vals)
    want = _duck(
        f"WITH t(value) AS (VALUES {duck_rows}) "
        f"SELECT {exact_sum6_wide_sql('value')}, "
        f"{exact_avg6_wide_sql('value')} FROM t"
    )[0]
    assert (got.s, got.a) == want


def test_exact_fast_path_overflow_fails_loudly(spark):
    """The round-14 runtime guard: an over-bound corpus must RAISE
    from the fast-path aggregate (assert_true sentinel in the same
    hash-aggregate pass), never silently wrap and hash-mismatch.
    The `_wide` pair must keep working on the same corpus."""
    from lambda_sample_spark.operators.common import (
        exact_avg6,
        exact_sum6,
        exact_sum6_wide,
    )

    # 1000 rows at 9.5e7: n*max|v| = 9.5e10 > EXACT_FAST_BOUND
    # (~9.2e10), while each value stays inside the wide pair's
    # DECIMAL(18,10) range (|v| < 1e8)
    over = spark.createDataFrame(
        [(95_000_000.25,)] * 1000, "value double"
    )
    # under the session's ANSI default the engine itself may raise
    # ARITHMETIC_OVERFLOW on the wrapping sum before the sentinel's
    # projection evaluates — either way the failure is LOUD
    for agg in (exact_sum6("value"), exact_avg6("value")):
        with pytest.raises(
            Exception, match="EXACT_FAST_BOUND|ARITHMETIC_OVERFLOW"
        ):
            over.agg(agg.alias("x")).collect()
    # the sentinel is what guarantees loudness when ANSI is OFF (the
    # silent-wrap / decimal-cast-NULL desync configuration)
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with pytest.raises(Exception, match="EXACT_FAST_BOUND"):
            over.agg(exact_sum6("value").alias("x")).collect()
        # the decimal-cast-NULL desync class (|v| >= 1e10 rows vanish
        # from the sum with no wrap at all) must also trip it
        huge = spark.createDataFrame(
            [(1.5e10,), (1.0,)], "value double"
        )
        with pytest.raises(Exception, match="EXACT_FAST_BOUND"):
            huge.agg(exact_sum6("value").alias("x")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)
    wide = over.agg(exact_sum6_wide("value").alias("x")).collect()[0].x
    assert wide == pytest.approx(95_000_000_250.0, abs=0)
    # all-NULL and empty groups stay on the pass path (count 0 / max
    # NULL must not trip the sentinel)
    nulls = spark.createDataFrame([(None,), (None,)], "value double")
    assert nulls.agg(exact_sum6("value").alias("x")).collect()[0].x is None


def test_exact_fast_path_bound_holds_on_testdata():
    """Guard for the BIGINT fast path's silent-wrap failure mode
    (ADVICE r12): Spark's non-ANSI sum(BIGINT) wraps while DuckDB
    widens to HUGEINT, so past n*max|v| ~ 9.2e10 the legs would
    desync with no error. Pin >=10x margin on the live gate corpus —
    if the testdata generator ever inflates magnitudes or group
    sizes past this, switch the contract rows to the `_wide` pair."""
    import duckdb as _dd
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    n, mx = _dd.connect().execute(
        "SELECT max(cnt), max(mx) FROM (SELECT count(*) AS cnt, "
        f"max(abs(value)) AS mx FROM read_parquet('{sf}/events.parquet') "
        "GROUP BY event_type)"
    ).fetchall()[0]
    # headroom also covers the graded sf10 decade (1000x sf0.01 rows)
    assert n * mx * 1000 * 10 < EXACT_FAST_BOUND


def test_money_sum2_matches_duckdb_and_decimal_ground_truth(spark):
    """Random 2dp money rows through the 4dp/6dp product templates:
    Spark == DuckDB == the true decimal computation (floor(x*10^s+.5)
    must recover the exact short rational every time)."""
    from decimal import Decimal

    rng = random.Random(7)
    rows = [
        (
            round(rng.uniform(900, 105000), 2),
            round(rng.uniform(0.0, 0.1), 2),
            round(rng.uniform(0.0, 0.08), 2),
        )
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, "price double, disc double, tax double")
    got = df.agg(
        _money_sum2("price * (1 - disc)", 4).alias("dp"),
        _money_sum2("price * (1 - disc) * (1 + tax)", 6).alias("ch"),
    ).collect()[0]
    duck_rows = ", ".join(f"({p!r}, {d!r}, {t!r})" for p, d, t in rows)
    # cast to DOUBLE: DuckDB parses VALUES literals as DECIMAL, but the
    # real parquet columns (and the template's contract) are DOUBLE
    want = _duck(
        f"WITH t AS (SELECT CAST(price AS DOUBLE) AS price, "
        f"CAST(disc AS DOUBLE) AS disc, CAST(tax AS DOUBLE) AS tax "
        f"FROM (VALUES {duck_rows}) v(price, disc, tax)) SELECT "
        f"{_money_sum2_sql('price * (1 - disc)', 4)}, "
        f"{_money_sum2_sql('price * (1 - disc) * (1 + tax)', 6)} FROM t"
    )[0]
    assert (got.dp, got.ch) == want

    # independent decimal-domain ground truth
    q = lambda v: Decimal(str(v))
    dp_true = sum(q(p) * (1 - q(d)) for p, d, _ in rows)
    ch_true = sum(q(p) * (1 - q(d)) * (1 + q(t)) for p, d, t in rows)
    cents = lambda x: float(
        (x * 100).quantize(Decimal(1), rounding="ROUND_HALF_UP") / 100
    )
    assert got.dp == pytest.approx(cents(dp_true), abs=0)
    assert got.ch == pytest.approx(cents(ch_true), abs=0)
