"""Funnel + cohort retention: strict-order drop-off semantics on a
crafted event log (the synthetic corpus converts 100%, so the
discriminating cases live here), plus the contract rows vs their
DuckDB oracles."""

from __future__ import annotations

from datetime import datetime

from lambda_sample_spark.operators.behavior import (
    ORACLE,
    cohort_retention,
    funnel_conversion,
    last_touch_attribution,
    q_attribution,
    q_cohort_retention,
    q_funnel,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _log(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime(2024, 1, d, h), u, t, 1.0, "{}")
            for i, (u, d, h, t) in enumerate(rows)
        ],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )


def test_strict_order_and_dropoff(spark):
    rows = [
        # u1 converts the full funnel in order
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
        # u2 views + clicks, never purchases
        (2, 1, 1, "view"), (2, 1, 2, "click"),
        # u3 purchased BEFORE clicking: strict order -> no purchase conv
        (3, 1, 1, "view"), (3, 1, 2, "purchase"), (3, 1, 3, "click"),
        # u4 clicked without ever viewing: not even step 1
        (4, 1, 1, "click"), (4, 1, 2, "purchase"),
        # u5 re-views after purchase; first-touch keeps the early view
        (5, 1, 1, "view"), (5, 1, 2, "click"), (5, 1, 3, "purchase"),
        (5, 1, 4, "view"),
    ]
    out = {r["step"]: r for r in funnel_conversion(_log(spark, rows)).collect()}
    assert out["view"]["n_users"] == 4       # u1, u2, u3, u5
    assert out["click"]["n_users"] == 4      # all viewers clicked after
    assert out["purchase"]["n_users"] == 2   # u1, u5 only (u3 out of order)
    assert out["purchase"]["conv_from_prev"] == 0.5
    assert out["purchase"]["conv_from_first"] == 0.5
    assert out["view"]["conv_from_prev"] == 1.0


def test_cohort_offsets(spark):
    rows = [
        (1, 1, 1, "view"), (1, 1, 5, "click"),   # day 1, active day 1
        (1, 3, 1, "view"),                         # ... and day 3 (offset 2)
        (2, 2, 1, "view"), (2, 2, 2, "view"),     # day-2 cohort, 2 events
    ]
    out = {
        (r["cohort_day_ms"], r["offset_days"]): r
        for r in cohort_retention(_log(spark, rows)).collect()
    }
    days = sorted({c for c, _ in out})
    d1, d2 = days
    assert out[(d1, 0)]["n_users"] == 1 and out[(d1, 0)]["n_events"] == 2
    assert out[(d1, 2)]["n_users"] == 1 and out[(d1, 2)]["n_events"] == 1
    assert out[(d2, 0)]["n_users"] == 1 and out[(d2, 0)]["n_events"] == 2
    assert (d2 - d1) == 86_400_000


def test_last_touch_credit_and_direct(spark):
    rows = [
        # u1: view -> click -> purchase => click credited
        (1, 1, 1, "view"), (1, 1, 2, "click"), (1, 1, 3, "purchase"),
        # u2: purchase with NO preceding touch => (direct); later
        # view -> purchase => view credited
        (2, 1, 1, "purchase"), (2, 1, 2, "view"), (2, 1, 3, "purchase"),
        # u3: click then TWO purchases: both credit the same click
        # (an intervening purchase is not a touch)
        (3, 1, 1, "click"), (3, 1, 2, "purchase"), (3, 1, 3, "purchase"),
    ]
    got = {
        r["channel"]: r
        for r in last_touch_attribution(_log(spark, rows)).collect()
    }
    assert got["click"]["n_conversions"] == 3
    assert got["view"]["n_conversions"] == 1
    assert got["(direct)"]["n_conversions"] == 1
    assert abs(got["click"]["share"] - 0.6) < 1e-9
    assert sum(r["n_conversions"] for r in got.values()) == 5


def test_attribution_contract_matches_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_attribution(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_attribution"]).fetchdf()
    assert compare("q_attribution", got, want) == []


def test_contract_rows_match_oracles(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    for name, fn in (
        ("q_funnel", q_funnel),
        ("q_cohort_retention", q_cohort_retention),
    ):
        sdf = fn(spark, SMOKE_SF_DIR)
        assert compare(name, sdf, con.execute(ORACLE[name]).fetchdf()) == []
