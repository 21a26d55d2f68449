"""OHLC / TWAP / correlation: hand-computed fixtures for the
order-and-weighting semantics + contract rows vs their DuckDB
oracles."""

from __future__ import annotations

from datetime import datetime

from lambda_sample_spark.operators.timeseries import (
    ORACLE,
    ohlc_bars,
    q_ohlc_bars,
    q_sensor_corr,
    q_twap,
    sensor_correlation,
    twap,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def test_ohlc_open_close_by_time_with_id_tiebreak(spark):
    ev = spark.createDataFrame(
        [
            # same hour; two rows share the same ms -> event_id breaks
            (2, datetime(2024, 1, 1, 10, 0, 0), 1, "a", 7.0, "{}"),
            (1, datetime(2024, 1, 1, 10, 0, 0), 1, "a", 3.0, "{}"),
            (3, datetime(2024, 1, 1, 10, 30, 0), 1, "a", 99.0, "{}"),
            (4, datetime(2024, 1, 1, 10, 45, 0), 1, "a", 1.0, "{}"),
        ],
        SCHEMA,
    )
    r = ohlc_bars(ev).collect()
    assert len(r) == 1
    bar = r[0]
    # open = value of event_id 1 (earliest ms, lowest id), close = last
    assert bar["open"] == 3.0 and bar["close"] == 1.0
    assert bar["high"] == 99.0 and bar["low"] == 1.0 and bar["n"] == 4


def test_twap_burst_does_not_dominate(spark):
    # value 10 held for 90s, then a 3-reading burst of 1000s inside
    # one second, then back to 10 for 9s: plain mean ~ 406, TWAP stays
    # near 10 because the burst holds for only ~1s of the 100s span
    rows, t0 = [], datetime(2024, 1, 1)
    from datetime import timedelta

    def at(sec):
        return t0 + timedelta(seconds=sec)

    rows = [
        (1, at(0), 1, "a", 10.0, "{}"),
        (2, at(90), 1, "a", 1000.0, "{}"),
        (3, at(90.5), 1, "a", 1000.0, "{}"),
        (4, at(91), 1, "a", 10.0, "{}"),
        (5, at(100), 1, "a", 10.0, "{}"),  # terminal: no interval
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    r = twap(ev).collect()[0]
    # exact: (10*90000 + 1000*500 + 1000*500 + 10*9000) / 100000
    assert r["span_ms"] == 100_000
    assert abs(r["twap"] - 19.9) < 1e-9


def test_correlation_sign_on_constructed_series(spark):
    # b moves with a (corr +1), c moves against a (corr -1), exactly
    rows, i = [], 0
    for h, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        for t, val in (("a", v), ("b", 2 * v + 1), ("c", -3 * v)):
            i += 1
            rows.append(
                (i, datetime(2024, 1, 1, h), 1, t, val, "{}")
            )
    ev = spark.createDataFrame(rows, SCHEMA)
    out = {
        (r["ta"], r["tb"]): r["corr"]
        for r in sensor_correlation(ev).collect()
    }
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_correlation_null_on_constant_series(spark):
    rows = []
    for h in range(3):
        rows.append((2 * h, datetime(2024, 1, 1, h), 1, "a", 5.0, "{}"))
        rows.append((2 * h + 1, datetime(2024, 1, 1, h), 1, "b", float(h), "{}"))
    ev = spark.createDataFrame(rows, SCHEMA)
    r = sensor_correlation(ev).collect()[0]
    assert r["corr"] is None  # zero variance -> undefined, not NaN


def test_contract_rows_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    for name, q in [
        ("q_ohlc_bars", q_ohlc_bars),
        ("q_twap", q_twap),
        ("q_sensor_corr", q_sensor_corr),
    ]:
        sdf = q(spark, SMOKE_SF_DIR)
        odf = con.execute(ORACLE[name]).fetchdf()
        assert compare(name, sdf, odf) == []


def test_label_centroid_cosine_geometry(spark):
    """Two labels along +x vs +y axes -> cos 0; a third along +x at a
    different magnitude -> cos 1 with the first (scale-invariant)."""
    from lambda_sample_spark.operators.similarity import label_centroid_sim

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [3.0, 0.0], 0),   # centroid label0 = (2, 0)
        (3, [0.0, 2.0], 1),   # centroid label1 = (0, 2)
        (4, [5.0, 0.0], 2),   # centroid label2 = (5, 0)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT"
    )
    out = {
        (r["la"], r["lb"]): r["cos"]
        for r in label_centroid_sim(emb).collect()
    }
    assert out[(0, 1)] == 0.0
    assert out[(0, 2)] == 1.0
    assert out[(1, 2)] == 0.0


def test_label_centroids_contract_vs_oracle(spark):
    from lambda_sample_spark.operators.similarity import (
        ORACLE as SIM_ORACLE,
        q_label_centroids,
    )

    con = duckdb_con(SMOKE_SF_DIR)
    sdf = q_label_centroids(spark, SMOKE_SF_DIR)
    odf = con.execute(SIM_ORACLE["q_label_centroids"]).fetchdf()
    assert compare("q_label_centroids", sdf, odf) == []


def test_ord_tiebreaker_headroom_on_contract_inputs():
    """_ord() packs ts_ms*1e6 + event_id into one bigint; the packing
    is collision-free only while event_id < 1e6. Fail loudly if the
    test generator ever scales event ids past that assumption (the
    OHLC oracle hash would otherwise flake nondeterministically)."""
    import duckdb

    for sf in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        hi = duckdb.sql(
            f"SELECT max(event_id) FROM '{sf}/events.parquet'"
        ).fetchone()[0]
        assert hi < 1_000_000, (
            f"{sf}: max event_id {hi} >= 1e6 — _ord() tiebreaker "
            "packing in timeseries.py would collide"
        )
