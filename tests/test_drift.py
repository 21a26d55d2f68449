"""drift_psi: a planted distribution shift must score far above the
stationary case, bins must cover edge ties deterministically, and the
contract row matches its DuckDB oracle (also covered by
test_contract, but kept here for the module's own suite)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from lambda_sample_spark.operators.drift import ORACLE, drift_psi, q_drift_psi
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
