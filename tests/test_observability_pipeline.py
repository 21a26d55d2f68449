"""The observability composition: runs end-to-end on driver testdata
and each health column equals the stand-alone operator's aggregate
over the same input (no example-only logic drifting from the
contract operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from examples.observability_pipeline import sensor_health
from lambda_sample_spark.operators.anomaly import robust_zscore
from lambda_sample_spark.operators.drift import q_drift_psi
from tests.conftest import SMOKE_SF_DIR


def test_health_frame_matches_standalone_operators(spark):
    health = {r["event_type"]: r for r in sensor_health(spark, SMOKE_SF_DIR).collect()}
    assert set(health) == {"click", "error", "purchase", "signup", "view"}

    robust = {
        r["event_type"]: r["n_outliers"]
        for r in robust_zscore(spark, SMOKE_SF_DIR).collect()
    }
    psi = {
        r["event_type"]: r["psi"] for r in q_drift_psi(spark, SMOKE_SF_DIR).collect()
    }
    for t, row in health.items():
        assert row["n_robust_outliers"] == robust[t]
        assert row["psi"] == psi[t]
        assert row["n_slots"] > 0
        # error events are the incident SOURCE, never flagged members
        if t == "error":
            assert row["n_in_incident"] == 0
