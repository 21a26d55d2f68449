"""resample_gapfill: hand-computed LOCF/interpolation on a planted
series, grid completeness, and the contract row vs its DuckDB oracle.
"""

from __future__ import annotations

from datetime import datetime

from lambda_sample_spark.operators.sessions import (
    ORACLE,
    q_resample_gapfill,
    resample_gapfill,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

H = 3_600_000  # 1 h in ms


def _series(spark, points):
    """points: list of (hour_offset, value|None rows to skip)."""
    base = datetime(2024, 1, 1)
    rows = [
        (i, datetime(2024, 1, 1, h), 0, "k", float(v), "{}")
        for i, (h, v) in enumerate(points)
    ]
    return spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING",
    )


def test_locf_and_interp_hand_computed(spark):
    # observed at hours 0 (v=10), 1 (v=20), 4 (v=50): gaps at 2, 3
    df = _series(spark, [(0, 10.0), (1, 20.0), (4, 50.0)])
    out = {
        r["slot_ms"]: r for r in resample_gapfill(df).collect()
    }
    assert len(out) == 5  # full grid hours 0..4
    t0 = min(out)
    gap2, gap3 = out[t0 + 2 * H], out[t0 + 3 * H]
    assert gap2["n_obs"] == 0 and gap3["n_obs"] == 0
    assert gap2["v_avg"] is None
    # LOCF carries 20 forward across the gap
    assert gap2["v_locf"] == 20.0 and gap3["v_locf"] == 20.0
    # linear interpolation between (1, 20) and (4, 50): 30 at h2, 40 at h3
    assert gap2["v_interp"] == 30.0 and gap3["v_interp"] == 40.0
    # observed slots pass through
    assert out[t0]["v_interp"] == 10.0 and out[t0]["v_locf"] == 10.0
    assert out[t0 + 4 * H]["v_interp"] == 50.0


def test_edges_and_slot_means(spark):
    # two obs in one slot average exactly; a leading gap cannot LOCF
    df = _series(spark, [(2, 1.0), (2, 2.0), (4, 9.0)])
    out = {r["slot_ms"]: r for r in resample_gapfill(df).collect()}
    assert len(out) == 3  # grid spans first..last OBSERVED slot (h2..h4)
    t0 = min(out)
    assert out[t0]["n_obs"] == 2 and out[t0]["v_avg"] == 1.5
    mid = out[t0 + H]
    assert mid["n_obs"] == 0 and mid["v_locf"] == 1.5
    assert mid["v_interp"] == 5.25  # 1.5 + (9-1.5) * 1/2


def test_contract_matches_oracle(spark):
    sdf = q_resample_gapfill(spark, SMOKE_SF_DIR)
    odf = duckdb_con(SMOKE_SF_DIR).execute(
        ORACLE["q_resample_gapfill"]
    ).fetchdf()
    assert compare("q_resample_gapfill", sdf, odf) == []
    # the smoke corpus genuinely exercises the fill paths
    pdf = sdf.toPandas()
    assert (pdf.n_obs == 0).sum() > 100
    assert pdf.v_interp.notna().all()


def test_ewma_hand_computed(spark):
    from lambda_sample_spark.operators.sessions import (
        ewma_smooth,
        q_ewma_smooth,
    )

    df = _series(spark, [(0, 10.0), (1, 20.0), (2, 30.0)])
    out = sorted(
        (r["ewma"] for r in ewma_smooth(df).collect())
    )
    # adjust=True EWMA, alpha 0.2:
    #   h0: 10
    #   h1: (20*.2 + 10*.16)/(.2+.16)              = 15.555556
    #   h2: (30*.2 + 20*.16 + 10*.128)/(.2+.16+.128) = 21.47541
    assert out == [10.0, 15.555556, 21.47541]
    # contract row matches its oracle (also in test_contract)
    sdf = q_ewma_smooth(spark, SMOKE_SF_DIR)
    odf = duckdb_con(SMOKE_SF_DIR).execute(
        ORACLE["q_ewma_smooth"]
    ).fetchdf()
    assert compare("q_ewma_smooth", sdf, odf) == []
