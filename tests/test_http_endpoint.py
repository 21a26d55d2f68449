"""The serving layer's HTTP route over real loopback HTTP: envelope
shape at GET /, TTL result-cache semantics (/ recomputes only past
the TTL; /stress never recomputes), single-flight refresh under
concurrent load, health and 404 paths."""

from __future__ import annotations

import json
import threading
import urllib.request
from datetime import datetime

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.streaming.http_endpoint import ServingEndpoint


pytestmark = pytest.mark.slow  # live-service/load/scale tier (round-16 task 1)


@pytest.fixture(scope="module")
def entry_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("entries") / "log")
    rows = [
        (s, datetime(2024, 1, 1, 0, 0, i), float(v), 0, 1)
        for s in ("power", "temp")
        for i, v in enumerate([1.0, 2.0, 3.0, 50.0])
    ]
    spark.createDataFrame(
        rows, "sensor STRING, ts TIMESTAMP, value DOUBLE, anomaly INT, batch_id LONG"
    ).write.parquet(d)
    return d


@pytest.fixture()
def endpoint(spark, entry_dir):
    ep = ServingEndpoint(spark, entry_dir, ttl_secs=3600.0)
    yield ep
    ep.stop()


def _get(ep, path):
    with urllib.request.urlopen(f"http://{ep.host}:{ep.port}{path}") as r:
        return r.status, r.read().decode(), r.headers.get("Content-Type")


def test_root_serves_allmeta_envelope(endpoint):
    status, body, ctype = _get(endpoint, "/")
    assert status == 200 and ctype == "application/json"
    payload = json.loads(body)
    assert set(payload) == {"entries"}
    names = {e["name"] for e in payload["entries"]}
    assert names == {"power", "temp"}
    for e in payload["entries"]:
        assert set(e) == {"name", "ts", "fast_anomaly", "full_anomaly", "avg_anomaly"}
        assert e["full_anomaly"] == -1.0  # no models registered


def test_cache_ttl_and_stress_semantics(endpoint):
    _get(endpoint, "/")
    n = endpoint.compute_count
    # within TTL: / serves the cache
    _get(endpoint, "/")
    assert endpoint.compute_count == n
    # /stress NEVER recomputes, even with an expired cache
    endpoint._cached_at = -1e9
    status, body, _ = _get(endpoint, "/stress")
    assert status == 200 and endpoint.compute_count == n
    # but / does refresh once expired
    _get(endpoint, "/")
    assert endpoint.compute_count == n + 1


def test_concurrent_cold_requests_compute_once(spark, entry_dir):
    ep = ServingEndpoint(spark, entry_dir, ttl_secs=3600.0)
    try:
        results = []

        def hit():
            results.append(_get(ep, "/")[0])

        threads = [threading.Thread(target=hit) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert results == [200] * 8
        assert ep.compute_count == 1  # single-flight refresh
    finally:
        ep.stop()


def test_stress_load_500c10_meets_sla(spark, entry_dir):
    """The reference's published measurement IS `hey -n 500 -c 10`
    against `/` and `/stress` (README.md:328-331): replay it over
    loopback — 500 requests at concurrency 10 per route, cache hot —
    and assert the 5 s SLA at p95 with the engine's own A8 quantile
    expression over the latency samples. The load must never trigger
    a recompute (T7: under load you serve the cache)."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    ep = ServingEndpoint(spark, entry_dir, ttl_secs=3600.0)
    try:
        _get(ep, "/")  # one Spark job warms the cache
        assert ep.compute_count == 1

        def hit(path):
            t0 = _time.perf_counter()
            status, _, _ = _get(ep, path)
            return status, _time.perf_counter() - t0

        for path in ("/", "/stress"):
            with ThreadPoolExecutor(max_workers=10) as pool:
                out = list(pool.map(hit, [path] * 500))
            assert all(s == 200 for s, _ in out)
            # A8 reuse: percentile_cont over the samples via the engine
            qdf = spark.createDataFrame(
                [(float(l),) for _, l in out], "sec DOUBLE"
            )
            p50, p95 = qdf.agg(
                F.expr("percentile(sec, array(0.5D, 0.95D))").alias("q")
            ).collect()[0].q
            assert p95 < 5.0, f"{path}: p95={p95:.4f}s breaches the 5s SLA"
            assert p50 < 0.5, f"{path}: p50={p50:.4f}s absurd for a cache hit"
        assert ep.compute_count == 1  # 1000 requests, zero recomputes
    finally:
        ep.stop()


def test_health_and_404(endpoint):
    status, body, _ = _get(endpoint, "/health")
    assert status == 200 and json.loads(body) == {"status": "ok"}
    try:
        urllib.request.urlopen(f"http://{endpoint.host}:{endpoint.port}/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
