"""drift_psi: a planted distribution shift must score far above the
stationary case, bins must cover edge ties deterministically, and the
contract row matches its DuckDB oracle (also covered by
test_contract, but kept here for the module's own suite)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from lambda_sample_spark.operators.drift import (
    ORACLE,
    drift_categorical,
    drift_psi,
    q_drift_categorical,
    q_drift_psi,
)
from tests.oracle_harness import compare, duckdb_con


def _frame(spark, ref_vals, cur_vals, key="k"):
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=i), 0, key, float(v), "{}")
        for i, v in enumerate(ref_vals)
    ] + [
        (10_000 + i, datetime(2024, 2, 1) + timedelta(minutes=i), 0, key, float(v), "{}")
        for i, v in enumerate(cur_vals)
    ]
    return spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )


def test_shift_scores_high_stationary_scores_low(spark):
    import random

    rng = random.Random(3)
    ref = [rng.gauss(0, 1) for _ in range(2000)]
    same = [rng.gauss(0, 1) for _ in range(2000)]
    shifted = [rng.gauss(1.5, 1) for _ in range(2000)]
    split = "2024-01-20 00:00:00"
    low = drift_psi(_frame(spark, ref, same), split).collect()[0]
    high = drift_psi(_frame(spark, ref, shifted), split).collect()[0]
    # the standard PSI reading: < 0.1 stable, > 0.25 shifted
    assert low.psi < 0.1, low
    assert high.psi > 0.5, high
    assert low.n_ref == 2000 and low.n_cur == 2000


def test_identical_slices_score_zero(spark):
    vals = [float(i % 37) for i in range(1000)]
    out = drift_psi(_frame(spark, vals, vals), "2024-01-20 00:00:00").collect()[0]
    assert out.psi == 0.0


def test_constant_values_degenerate_but_finite(spark):
    # all-equal values collapse every edge to the same number: every
    # row lands in bin 0 on both sides -> PSI exactly 0, no div/0, no
    # NaN from the smoothing
    out = drift_psi(
        _frame(spark, [5.0] * 300, [5.0] * 300), "2024-01-20 00:00:00"
    ).collect()[0]
    assert out.psi == 0.0


def test_contract_row_matches_oracle(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        want = con.execute(ORACLE["q_drift_psi"]).fetchdf()
    finally:
        con.close()
    assert compare("q_drift_psi", q_drift_psi(spark, sf_dir), want) == []


def _cat_frame(spark, ref_types, cur_types, cohort=0):
    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=i), cohort, t, 1.0, "{}")
        for i, t in enumerate(ref_types)
    ] + [
        (10_000 + i, datetime(2024, 2, 1) + timedelta(minutes=i), cohort, t, 1.0, "{}")
        for i, t in enumerate(cur_types)
    ]
    return spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, cohort BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )


def test_categorical_shift_scores_high_stationary_low(spark):
    split = "2024-01-20 00:00:00"
    mix = ["click"] * 600 + ["view"] * 300 + ["error"] * 100
    shifted = ["click"] * 100 + ["view"] * 300 + ["error"] * 600
    low = drift_categorical(_cat_frame(spark, mix, list(mix)), split).collect()[0]
    high = drift_categorical(_cat_frame(spark, mix, shifted), split).collect()[0]
    assert low.jsd < 1e-6, low
    assert high.jsd > 0.1, high
    assert low.n_ref == 1000 and low.n_cur == 1000


def test_categorical_new_category_counts_as_shift(spark):
    # a category absent from the reference mix still enters the grid
    # (unlike the numeric bin edges, which only the reference defines)
    split = "2024-01-20 00:00:00"
    out = drift_categorical(
        _cat_frame(spark, ["a"] * 500, ["a"] * 250 + ["brand_new"] * 250), split
    ).collect()[0]
    assert out.jsd > 0.05, out


def test_categorical_bounded_by_ln2(spark):
    # disjoint category sets are maximal shift; JSD <= ln 2
    import math

    split = "2024-01-20 00:00:00"
    out = drift_categorical(
        _cat_frame(spark, ["a"] * 400, ["b"] * 400), split
    ).collect()[0]
    assert 0.5 < out.jsd <= math.log(2) + 1e-9, out


def test_categorical_contract_row_matches_oracle(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        want = con.execute(ORACLE["q_drift_categorical"]).fetchdf()
    finally:
        con.close()
    assert (
        compare("q_drift_categorical", q_drift_categorical(spark, sf_dir), want)
        == []
    )
