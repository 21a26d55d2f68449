"""Welch A/B test + PMI association: hand-computed fixtures for the
statistical semantics, plus the contract rows vs their DuckDB
oracles at smoke scale."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime

from lambda_sample_spark.operators.stats import (
    ORACLE,
    pmi_association,
    q_ab_welch,
    q_pmi_association,
    welch_ab_test,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def _arm(user_id: int) -> int:
    word = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    return word % 2


def test_welch_matches_hand_computed_statistic(spark):
    # craft per-arm samples using the REAL hash assignment, so the
    # expected statistic is computed from the same arm split
    t0 = datetime(2024, 1, 1)
    rows, a_vals, b_vals = [], [], []
    for uid in range(20):
        v = float(10 + uid) if _arm(uid) == 0 else float(30 + 2 * uid)
        (a_vals if _arm(uid) == 0 else b_vals).append(v)
        rows.append((uid, t0, uid, "x", v, "{}"))
    got = welch_ab_test(spark.createDataFrame(rows, SCHEMA)).collect()[0]

    def mv(xs):
        n = len(xs)
        m = sum(xs) / n
        var = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, var

    na, ma, va = mv(a_vals)
    nb, mb, vb = mv(b_vals)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["mean_a"] - ma) < 1e-6 and abs(got["mean_b"] - mb) < 1e-6
    assert abs(got["t_stat"] - t) < 1e-5
    assert abs(got["welch_df"] - df) < 1e-4


def test_pmi_zero_under_independence_and_ln_k_on_diagonal(spark):
    # independent: every (x, y) cell equally likely -> pmi == 0
    indep = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "cd" for _ in range(3)],
        "x STRING, y STRING",
    )
    for r in pmi_association(indep, "x", "y").collect():
        assert r["pmi"] == 0.0 and r["mi_term"] == 0.0

    # perfectly dependent: x == y over k=4 symbols -> each diagonal
    # cell has pmi ln(k), and the MI contributions sum to ln(k)
    dep = spark.createDataFrame(
        [(s, s) for s in "abcd" for _ in range(5)], "x STRING, y STRING"
    )
    rows = pmi_association(dep, "x", "y").collect()
    assert len(rows) == 4
    for r in rows:
        assert abs(r["pmi"] - math.log(4)) < 1e-6
    assert abs(sum(r["mi_term"] for r in rows) - math.log(4)) < 1e-5


def test_contract_rows_match_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    for name, fn in (
        ("q_ab_welch", q_ab_welch),
        ("q_pmi_association", q_pmi_association),
    ):
        got = fn(spark, SMOKE_SF_DIR)
        want = con.execute(ORACLE[name]).fetchdf()
        assert compare(name, got, want) == []
