"""Reference-fidelity golden tests, ported from the reference's
AnalyzerSpec (SURVEY.md §5): heuristic scores for probe values
(10, 200, -100) against the first 200 rows of the first sensor must be
(0, 1, 0.5 +/- 0.5). Our committed fixture reproduces the reference
fixture's regimes (normal in [-99, 99], anomalous +/-[100, 150]), so
the same triple holds.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.functions.scoring import clamp01, heuristic_score, weighted_ensemble
from lambda_sample_spark.sources.csv_source import read_entries_csv


@pytest.fixture(scope="module")
def first_sensor_window(spark):
    df = read_entries_csv(spark)
    first_sensor = df.select("sensor").first().sensor
    window = (
        df.where(F.col("sensor") == first_sensor)
        .orderBy(F.col("ts").asc())
        .limit(200)
    )
    stats = window.agg(
        F.avg("value").alias("avg"), F.stddev_pop("value").alias("sd")
    ).collect()[0]
    return stats.avg, stats.sd


def _score(spark, value, avg, sd):
    row = spark.range(1).select(
        heuristic_score(F.lit(float(value)), F.lit(avg), F.lit(sd)).alias("s")
    ).collect()[0]
    return row.s


def test_heuristic_golden_triple(spark, first_sensor_window):
    avg, sd = first_sensor_window
    # AnalyzerSpec.scala:24-39 golden expectations
    assert _score(spark, 10, avg, sd) == 0.0
    assert _score(spark, 200, avg, sd) == 1.0
    mid = _score(spark, -100, avg, sd)
    assert 0.0 <= mid <= 1.0


def test_clamp_bounds(spark):
    rows = spark.range(1).select(
        clamp01(F.lit(-0.5)).alias("lo"),
        clamp01(F.lit(1.5)).alias("hi"),
        clamp01(F.lit(0.25)).alias("mid"),
    ).collect()[0]
    assert (rows.lo, rows.hi, rows.mid) == (0.0, 1.0, 0.25)


def test_weighted_ensemble_fallback(spark):
    rows = spark.range(1).select(
        weighted_ensemble(F.lit(0.4), F.lit(None).cast("double")).alias("fallback"),
        weighted_ensemble(F.lit(0.4), F.lit(1.0)).alias("blend"),
    ).collect()[0]
    assert rows.fallback == 0.4
    # (35*0.4 + 65*1.0)/100 = 0.79  (Analyzer.scala:143-147)
    assert abs(rows.blend - 0.79) < 1e-12


def test_population_not_sample_stddev(spark, first_sensor_window):
    """The reference divides by n (Analyzer.scala:51-52); guard against
    the easy stddev_samp regression."""
    _, sd_pop = first_sensor_window
    df = read_entries_csv(spark)
    first_sensor = df.select("sensor").first().sensor
    sd_samp = (
        df.where(F.col("sensor") == first_sensor)
        .orderBy(F.col("ts").asc())
        .limit(200)
        .agg(F.stddev_samp("value"))
        .collect()[0][0]
    )
    assert sd_pop != sd_samp


def test_all_meta_json_empty_envelope(spark):
    # EndpointSpec.scala:32-46 golden: empty analysis serializes to
    # EXACTLY {"entries":[]}
    from lambda_sample_spark.sources.json_codec import META_FIELDS, all_meta_json

    empty = spark.createDataFrame(
        [],
        "name string, ts bigint, fast_anomaly double, "
        "full_anomaly double, avg_anomaly double",
    )
    assert all_meta_json(empty) == '{"entries":[]}'

    one = spark.createDataFrame(
        [("Motel 6", 1700000000000, 0.5, -1.0, 12.0)],
        "name string, ts bigint, fast_anomaly double, "
        "full_anomaly double, avg_anomaly double",
    )
    js = all_meta_json(one)
    # Jackson field order preserved (SURVEY.md §7 hard part 5)
    order = [js.index(f'"{f}"') for f in META_FIELDS]
    assert order == sorted(order)
    assert js.startswith('{"entries":[{"name":"Motel 6"')
