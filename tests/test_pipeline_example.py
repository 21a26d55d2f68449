"""The end-to-end pretraining pipeline example (examples/
pretrain_pipeline.py): all eight stages compose, survivor counts are
monotone, and the whole run is deterministic."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from lambda_sample_spark.io import load_table

STAGES = [
    "input",
    "quality_gate",
    "exact_dedup",
    "near_dedup",
    "decontaminate",
    "source_cap",
    "stratified_sample",
    "packed_docs",
]


def _run(spark, sf_dir, tmp_path, tag):
    from pretrain_pipeline import run_pipeline

    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.orderBy("doc_id")
        .limit(3)
        .select(F.concat(F.lit("b-"), F.col("doc_id")).alias("bench_id"), "text")
    )
    out = str(tmp_path / f"out_{tag}")
    idx = str(tmp_path / f"idx_{tag}")
    counts = run_pipeline(spark, docs, bench, idx, out)
    packed = spark.read.parquet(f"{out}/packed")
    return counts, packed


def test_pipeline_stages_compose_and_are_deterministic(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    counts, packed = _run(spark, sf, tmp_path, "a")

    # survivor counts monotone non-increasing through the funnel
    vals = [counts[s] for s in STAGES]
    assert vals[0] > 0
    assert all(a >= b for a, b in zip(vals, vals[1:])), counts
    # dedup actually fired on this duplicate-heavy corpus, and the
    # benchmark plants were decontaminated
    assert counts["near_dedup"] < counts["exact_dedup"]
    assert counts["decontaminate"] < counts["near_dedup"]
    # telemetry consistency: the observe() pass saw every input row
    assert counts["telemetry_n_input"] == counts["input"]

    # every surviving doc is packed exactly once, with sane bins, and
    # the training-order stage actually materialized its shard column
    assert packed.count() == counts["packed_docs"]
    assert packed.select("doc_id").distinct().count() == counts["packed_docs"]
    assert packed.where(F.col("bin_id").isNull()).count() == 0
    assert "shard" in packed.columns
    assert packed.select("shard").distinct().count() > 1
    # a bin is never split across training shards (bins are the unit
    # the loader reads)
    assert (
        packed.groupBy("bin_id")
        .agg(F.count_distinct("shard").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
        == 0
    )

    # determinism: an independent second run produces the identical
    # packed assignment (fresh index root, fresh output dir)
    counts2, packed2 = _run(spark, sf, tmp_path, "b")
    assert counts2 == counts
    assert packed.exceptAll(packed2).count() == 0
    assert packed2.exceptAll(packed).count() == 0
