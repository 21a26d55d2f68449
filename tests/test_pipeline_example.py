"""The end-to-end pretraining pipeline example (examples/
pretrain_pipeline.py): all ten stages compose, survivor counts are
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
    "substring_scrub",
    "near_dedup",
    "decontaminate",
    "source_cap",
    "stratified_sample",
    "dsir_select",
    "packed_docs",
]


import pytest

pytestmark = pytest.mark.slow  # scale/e2e tier (round-16 task 1)


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
    # the substring scrub fired on this boilerplate-heavy corpus but
    # removed PASSAGES, not docs (the funnel row count is untouched)
    assert 0 < counts["substring_scrub_docs_touched"] <= counts["exact_dedup"]

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

    # DSIR selection kept ~the asked fraction and every token-table
    # row is a selected doc, tokenized (>= one subword per word)
    tokens = packed.sparkSession.read.parquet(
        str(tmp_path / "out_a" / "tokens")
    )
    assert counts["bpe_tokenized"] == counts["dsir_select"]
    assert tokens.count() == counts["dsir_select"]
    assert tokens.where(F.col("n_subwords") < F.col("n_words")).count() == 0
    packed_ids = {r["doc_id"] for r in packed.select("doc_id").collect()}
    token_ids = {r["doc_id"] for r in tokens.select("doc_id").collect()}
    assert packed_ids == token_ids  # both artifacts cover the final corpus

    # span-corruption pairs cover the final corpus too (stage 7c)
    pairs = packed.sparkSession.read.parquet(
        str(tmp_path / "out_a" / "span_pairs")
    )
    assert counts["span_pairs"] == counts["dsir_select"]
    assert {r["doc_id"] for r in pairs.select("doc_id").collect()} == packed_ids
    assert set(pairs.columns) == {
        "doc_id", "n_tokens", "n_spans", "input_text", "target_text"
    }

    # determinism: an independent second run produces the identical
    # packed assignment and token table (fresh index root, fresh
    # output dir)
    counts2, packed2 = _run(spark, sf, tmp_path, "b")
    assert counts2 == counts
    assert packed.exceptAll(packed2).count() == 0
    tokens2 = packed.sparkSession.read.parquet(
        str(tmp_path / "out_b" / "tokens")
    )
    assert tokens.exceptAll(tokens2).count() == 0
    assert packed2.exceptAll(packed).count() == 0
