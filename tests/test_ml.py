"""ML-layer tests mirroring the reference's tolerance-band philosophy
(AnalyzerSpec.scala:41-55): posterior bands, not exact values."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.ml.forest import (
    _labeled_events,
    predict_posterior,
    train_models,
    train_per_key_pandas,
)
from lambda_sample_spark.sources.csv_source import read_entries_csv


@pytest.fixture(scope="module")
def fixture_models(spark):
    df = read_entries_csv(spark).withColumnRenamed("sensor", "event_type")
    return train_models(df), df


def test_rf_posterior_bands(spark, fixture_models):
    """Normal value -> low P(anomaly); extreme -> high; boundary ->
    anywhere (the reference's 0.5 +/- 0.5 band)."""
    models, _ = fixture_models
    assert models, "at least one sensor must train"
    model = models[sorted(models)[0]]
    probes = spark.createDataFrame([(10.0,), (200.0,), (-100.0,)], "value DOUBLE")
    scored = {
        r.value: r.p_anomaly for r in predict_posterior(model, probes).collect()
    }
    assert scored[10.0] <= 0.2  # 0.1 +/- 0.1
    assert scored[200.0] >= 0.8  # 0.9 +/- 0.1
    assert 0.0 <= scored[-100.0] <= 1.0  # 0.5 +/- 0.5


def test_single_class_skip(spark):
    """Single-class keys are skipped, not errors (Trainer.scala:47-49)."""
    df = spark.createDataFrame(
        [("only", float(i), 0) for i in range(50)],
        "event_type STRING, value DOUBLE, anomaly INT",
    )
    assert train_models(df) == {}


def test_histogram_models_scalable_path(spark, sf_dir):
    from lambda_sample_spark.operators.common import events

    labeled = _labeled_events(events(spark, sf_dir))
    out = train_per_key_pandas(labeled).collect()
    assert len(out) == 5 * 20  # one row per (event_type, bin) — scalar cols only
    by_key: dict[str, list] = {}
    for row in out:
        by_key.setdefault(row.event_type, []).append(row)
        assert 0.0 <= row.posterior <= 1.0
        assert row.n_pos <= row.n_in_bin
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.bin)
        assert [r.bin for r in rows] == list(range(20))
        # bins partition the key's rows exactly
        assert sum(r.n_in_bin for r in rows) == rows[0].n_rows
        # left edges are increasing (equi-width grid)
        los = [r.bin_lo for r in rows]
        assert all(a < b for a, b in zip(los, los[1:]))


def test_model_save_load_roundtrip(spark, tmp_path):
    # M3 (BinarySerializer.scala:88-101 -> MLlib native save/load):
    # persisted model must predict identically to the in-memory one
    from pyspark.ml.classification import RandomForestClassificationModel

    from lambda_sample_spark.ml.forest import (
        _labeled_events,
        predict_posterior,
        train_models,
    )
    from lambda_sample_spark.operators.common import events

    labeled = _labeled_events(events(spark, "/root/testdata/sf0.001"))
    models = train_models(labeled)
    assert models, "no key had two classes"
    key, model = sorted(models.items())[0]
    path = str(tmp_path / "rf_model")
    model.write().overwrite().save(path)
    loaded = RandomForestClassificationModel.load(path)

    probes = spark.createDataFrame([(10.0,), (480.0,)], "value DOUBLE")
    a = [r.p_anomaly for r in predict_posterior(model, probes).collect()]
    b = [r.p_anomaly for r in predict_posterior(loaded, probes).collect()]
    assert a == b


def test_tree_debug_export(spark, fixture_models):
    # M4 (README.md:235-239: rf.trees()(0).dot -> toDebugString)
    from lambda_sample_spark.ml.forest import export_tree_debug

    models, _ = fixture_models
    text = export_tree_debug(models[sorted(models)[0]])
    assert "If (feature" in text and "Predict:" in text


def test_rf_metadata_matches_duckdb(spark):
    # The rows-only RF contract rows now carry deterministic training-set
    # metadata (row counts, class counts, feature extents over the
    # newest-RECENT_TRAIN_N window); DuckDB replays that structure
    # exactly even though the MLlib posteriors have no SQL twin.
    import duckdb

    from lambda_sample_spark.ml.forest import (
        LABEL_THRESHOLD,
        RECENT_TRAIN_N,
        rf_predict,
        rf_train,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = {
        r[0]: r[1:]
        for r in con.execute(
            f"""
            WITH recent AS (
              SELECT event_type, value,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            )
            SELECT event_type, count(*) AS n_train_rows,
                   sum(CASE WHEN value > {LABEL_THRESHOLD} THEN 1 ELSE 0 END) AS n_train_pos,
                   round(min(value), 6) AS train_vmin,
                   round(max(value), 6) AS train_vmax
            FROM recent WHERE rn <= {RECENT_TRAIN_N}
            GROUP BY event_type
            """
        ).fetchall()
    }
    got_train = rf_train(spark, sf).collect()
    assert got_train, "at least one key must train"
    for r in got_train:
        n_rows, n_pos, vmin, vmax = want[r.event_type]
        assert r.n_train_rows == n_rows, r
        assert r.n_train_pos == n_pos, r
        assert r.train_vmin == vmin and r.train_vmax == vmax, r

    for r in rf_predict(spark, sf).collect():
        n_rows, n_pos, *_ = want[r.event_type]
        assert r.n_train_rows == n_rows and r.n_train_pos == n_pos, r
        assert r.above_threshold == (r.value > LABEL_THRESHOLD), r


def test_rf_predict_matches_oracle(spark):
    # round 11: the contract row scores with the deterministic
    # histogram model, so it is fully value-checkable
    from lambda_sample_spark.ml.forest import ORACLE, rf_predict
    from tests.oracle_harness import compare, duckdb_con

    sf = "/root/testdata/sf0.01"
    want = duckdb_con(sf).execute(ORACLE["q_rf_predict"]).fetchdf()
    assert compare("q_rf_predict", rf_predict(spark, sf), want) == []


def test_rf_predict_mllib_twin_bands(spark):
    # the MLlib forest stays as the production twin: same keys and
    # deterministic metadata as the contract row, posteriors inside
    # the reference's tolerance bands (AnalyzerSpec philosophy)
    from lambda_sample_spark.ml.forest import rf_predict, rf_predict_mllib

    sf = "/root/testdata/sf0.01"
    det = {(r.event_type, r.value): r for r in rf_predict(spark, sf).collect()}
    ml = {
        (r.event_type, r.value): r
        for r in rf_predict_mllib(spark, sf).collect()
    }
    assert set(det) == set(ml) and det
    for k, r in ml.items():
        d = det[k]
        assert (r.n_train_rows, r.n_train_pos) == (d.n_train_rows, d.n_train_pos)
        assert r.above_threshold == d.above_threshold
        assert 0.0 <= r.p_anomaly <= 1.0
        # both learners agree on the easy probes: normal low, extreme high
        if r.value == 10.0:
            assert r.p_anomaly <= 0.2 and d.p_anomaly <= 0.2
        if r.value == 480.0:
            assert r.p_anomaly >= 0.8 and d.p_anomaly >= 0.8
