"""Serving observability (/perf as a query): request micro-batches
persist to the metrics table, partials merge without raw re-reads,
and the box-plot stats reuse the A8/A9 semantics."""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime

import pytest

from lambda_sample_spark.streaming.http_endpoint import ServingEndpoint
from lambda_sample_spark.streaming.perf import (
    REQUEST_SCHEMA,
    flush_requests,
    perf_box_stats,
    perf_report,
)


@pytest.fixture(scope="module")
def entry_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("perf_entries") / "log")
    rows = [
        ("power", datetime(2024, 1, 1, 0, 0, i), float(i), 0, 1)
        for i in range(6)
    ]
    spark.createDataFrame(
        rows, "sensor STRING, ts TIMESTAMP, value DOUBLE, anomaly INT, batch_id LONG"
    ).write.parquet(d)
    return d


def _get(ep, path):
    with urllib.request.urlopen(f"http://{ep.host}:{ep.port}{path}") as r:
        return r.status, r.read().decode()


def test_perf_route_is_a_query_over_the_persisted_log(spark, entry_dir, tmp_path):
    mdir = str(tmp_path / "metrics")
    ep = ServingEndpoint(
        spark, entry_dir, ttl_secs=3600.0, metrics_dir=mdir
    )
    try:
        for _ in range(3):
            _get(ep, "/")
        for _ in range(5):
            _get(ep, "/stress")
        status, body = _get(ep, "/perf")
        assert status == 200
        payload = json.loads(body)
        by_route = {r["route"]: r for r in payload["routes"]}
        assert by_route["/"]["n"] == 3
        assert by_route["/stress"]["n"] == 5
        # box-plot + profile columns present and coherent
        r = by_route["/"]
        assert r["q1"] <= r["median"] <= r["q3"] <= r["max_ms"]
        assert r["profile_n"] == 3  # partial-merged count == raw count
        assert r["n_statuses_est"] == 1  # only 200s
        # the metrics table persists across endpoint restarts: the raw
        # log has every pre-/perf request
        reqs = spark.read.parquet(f"{mdir}/requests")
        assert reqs.where("route = '/'").count() == 3
        assert reqs.where("route = '/stress'").count() == 5
        # a second /perf sees the first one's own request logged
        _get(ep, "/perf")
        status, body = _get(ep, "/perf")
        by_route = {r["route"]: r for r in json.loads(body)["routes"]}
        assert by_route["/perf"]["n"] == 2
    finally:
        ep.stop()


def test_box_stats_match_a8_quantile_semantics(spark):
    """percentile() with linear interpolation on a known series, and
    the A9 1.5*IQR outlier census."""
    durs = [1.0, 2.0, 3.0, 4.0, 100.0]  # q1=2, med=3, q3=4, one outlier
    rows = [
        (datetime(2024, 1, 1, 0, 0, i), "/x", 200, d)
        for i, d in enumerate(durs)
    ]
    out = perf_box_stats(
        spark.createDataFrame(rows, REQUEST_SCHEMA)
    ).collect()[0]
    assert (out["q1"], out["median"], out["q3"]) == (2.0, 3.0, 4.0)
    assert (out["lo_whisker"], out["hi_whisker"]) == (-1.0, 7.0)
    assert out["n_outliers"] == 1 and out["max_ms"] == 100.0


def test_partials_merge_across_flushes_without_raw_reread(spark, tmp_path):
    mdir = str(tmp_path / "m2")
    b1 = [(datetime(2024, 1, 1, 0, 0, i), "/", 200, float(i + 1)) for i in range(4)]
    b2 = [(datetime(2024, 1, 1, 0, 5, i), "/", 200, float(i + 10)) for i in range(2)]
    assert flush_requests(spark, b1, mdir) == 4
    assert flush_requests(spark, b2, mdir) == 2
    report = {r["route"]: r for r in perf_report(spark, mdir)}
    r = report["/"]
    assert r["n"] == 6 and r["profile_n"] == 6
    # exact-decimal mean over both micro-batches: (1+2+3+4+10+11)/6
    assert r["profile_mean_ms"] == round(31 / 6, 6)
    assert r["min_ms"] == 1.0


def test_flush_empty_buffer_noop(spark, tmp_path):
    assert flush_requests(spark, [], str(tmp_path / "m3")) == 0
