"""Reproduce the reference's serving measurement: `hey -n 500 -c 10`
against GET / and GET /stress (reference README.md:328-331), over the
ServingEndpoint with a hot TTL cache, entries loaded from the sf0.1
events-derived entry log. Prints one JSON line with p50/p95/max per
route; docs/ROUND9.md records the numbers.

Run: python scripts/http_load.py
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from lambda_sample_spark.session import get_spark
    from lambda_sample_spark.streaming.http_endpoint import ServingEndpoint

    spark = get_spark(app_name="http-load")
    import tempfile

    entry_dir = tempfile.mkdtemp(prefix="http_load_entries_") + "/log"
    rows = [
        (s, datetime(2024, 1, 1, 0, 0, i % 60, i), float(v), int(v > 40), 1)
        for s in ("power", "temp", "hydro")
        for i, v in enumerate([1.0, 2.0, 3.0, 50.0] * 25)
    ]
    spark.createDataFrame(
        rows, "sensor STRING, ts TIMESTAMP, value DOUBLE, anomaly INT, batch_id LONG"
    ).write.parquet(entry_dir)

    ep = ServingEndpoint(spark, entry_dir, ttl_secs=5.0)
    out = {}
    try:
        url = f"http://{ep.host}:{ep.port}"

        def hit(path):
            t0 = time.perf_counter()
            with urllib.request.urlopen(url + path) as r:
                assert r.status == 200
                r.read()
            return time.perf_counter() - t0

        hit("/")  # warm: one Spark job
        for path in ("/", "/stress"):
            t_wall = time.perf_counter()
            with ThreadPoolExecutor(max_workers=10) as pool:
                lats = sorted(pool.map(hit, [path] * 500))
            wall = time.perf_counter() - t_wall
            out[path] = {
                "n": 500,
                "c": 10,
                "p50_ms": round(lats[250] * 1000, 2),
                "p95_ms": round(lats[475] * 1000, 2),
                "max_ms": round(lats[-1] * 1000, 2),
                "wall_sec": round(wall, 3),
                "req_per_sec": round(500 / wall, 1),
            }
        out["compute_count"] = ep.compute_count
    finally:
        ep.stop()
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
