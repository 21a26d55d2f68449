"""The product-analytics composition: end-to-end on driver testdata
with the cross-consistency checks the report relies on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from examples.product_analytics import growth_report
from lambda_sample_spark.operators.common import events
from tests.conftest import SMOKE_SF_DIR


def test_report_frames_are_cross_consistent(spark):
    report = growth_report(spark, SMOKE_SF_DIR)

    # attribution conservation: every purchase event is credited
    # exactly once (shares sum to 1)
    attr = report["attribution"].collect()
    n_purchases = (
        events(spark, SMOKE_SF_DIR)
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_conversions"] for r in attr) == n_purchases
    assert abs(sum(r["share"] for r in attr) - 1.0) < 1e-4

    # funnel monotonicity: strict-order step counts never increase
    steps = sorted(report["funnel"].collect(), key=lambda r: r["step_idx"])
    counts = [r["n_users"] for r in steps]
    assert counts == sorted(counts, reverse=True)

    # A/B readout: one row per event type, finite statistics (the
    # split is a pure user-id hash, so the null is true — |t| stays
    # in single digits on real data)
    ab = report["ab_test"].collect()
    assert len(ab) == 5
    for r in ab:
        assert math.isfinite(r["t_stat"]) and math.isfinite(r["welch_df"])
        assert r["n_a"] > 0 and r["n_b"] > 0

    # retention: day-1 rate is a proper fraction of the day-0 cohort
    for r in report["retention_d1"].collect():
        assert 0 <= r["d1_users"] <= r["d0_users"]
        assert 0.0 <= r["d1_rate"] <= 1.0
