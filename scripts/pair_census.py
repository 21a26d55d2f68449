"""Pair-output census for the pair-heavy dedup rows (round-11 verdict
task #1): prove the sf1 wall-clock growth of q_embed_near_dup /
q_winnow_near_dup is OUTPUT-shaped (the planted duplicate density
makes true pairs grow ~quadratically per decade), not a hidden
unbounded quadratic in the plan.

Per SF dir this records, from one Spark session:

  embeddings:
    n_vectors, n_labels, max_block, computed_pairs (sum n_b*(n_b-1)/2
    — the exact path's work term), out_pairs_total (true pairs at the
    contract threshold), and the production-twin wall
    (near_dup_pairs(vectorized=True), the x_embed_prod path).
  documents:
    winnow_pairs (winnow_near_dup output rows at library defaults,
    gram_hash='fast' — the x_winnow_neardup_prod path) and its wall.

Usage:  python scripts/pair_census.py [out_json] [sf_dir ...]
Default SFs: /root/testdata/sf{0.001,0.01,0.1} + /tmp/sf1 (if present).
Writes docs/PAIR_CENSUS.json (committed — the judge's evidence).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/tmp/sf1",
]


def census_one(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from lambda_sample_spark.io import load_table
    from lambda_sample_spark.operators.similarity import (
        as_double,
        near_dup_pairs,
    )
    from lambda_sample_spark.operators.text import winnow_near_dup

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    blocks = (
        emb.groupBy("label")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_labels"),
            F.sum("n").alias("n_vectors"),
            F.max("n").alias("max_block"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("computed_pairs"),
        )
        .first()
    )
    t0 = time.perf_counter()
    out_pairs = near_dup_pairs(emb, vectorized=True).count()
    embed_prod_wall = time.perf_counter() - t0

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    t0 = time.perf_counter()
    winnow_pairs = winnow_near_dup(docs, gram_hash="fast").count()
    winnow_prod_wall = time.perf_counter() - t0

    return {
        "n_vectors": int(blocks["n_vectors"]),
        "n_labels": int(blocks["n_labels"]),
        "max_block": int(blocks["max_block"]),
        "computed_pairs": int(blocks["computed_pairs"]),
        "embed_out_pairs": int(out_pairs),
        "embed_prod_wall_sec": round(embed_prod_wall, 3),
        "n_docs": int(n_docs),
        "winnow_out_pairs": int(winnow_pairs),
        "winnow_prod_wall_sec": round(winnow_prod_wall, 3),
    }


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else str(
        REPO / "docs" / "PAIR_CENSUS.json"
    )
    sf_dirs = sys.argv[2:] or [d for d in DEFAULT_SFS if os.path.isdir(d)]

    from lambda_sample_spark.session import get_spark

    spark = get_spark(app_name="pair-census")
    results: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        t0 = time.perf_counter()
        results[sf_dir] = census_one(spark, sf_dir)
        print(
            f"{sf_dir}: {json.dumps(results[sf_dir])} "
            f"({time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    spark.stop()

    # decade-over-decade growth ratios (the committed evidence: output
    # pairs and the exact-path work term should move together; walls
    # should track output, not outgrow it)
    keys = list(results)
    growth = {}
    for a, b in zip(keys, keys[1:]):
        ra, rb = results[a], results[b]
        growth[f"{a} -> {b}"] = {
            "vectors": round(rb["n_vectors"] / max(ra["n_vectors"], 1), 2),
            "computed_pairs": round(
                rb["computed_pairs"] / max(ra["computed_pairs"], 1), 2
            ),
            "embed_out_pairs": round(
                rb["embed_out_pairs"] / max(ra["embed_out_pairs"], 1), 2
            ),
            "embed_prod_wall": round(
                rb["embed_prod_wall_sec"] / max(ra["embed_prod_wall_sec"], 1e-9), 2
            ),
            "winnow_out_pairs": round(
                rb["winnow_out_pairs"] / max(ra["winnow_out_pairs"], 1), 2
            ),
            "winnow_prod_wall": round(
                rb["winnow_prod_wall_sec"] / max(ra["winnow_prod_wall_sec"], 1e-9),
                2,
            ),
        }

    payload = {"per_sf": results, "growth": growth}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
