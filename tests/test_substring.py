"""Exact substring dedup (Lee et al. 2022 semantics): planted
cross-doc passages, the min-length edge, within-doc repeats, span
removal, and the contract row vs its DuckDB oracle."""

from __future__ import annotations

import random
import string

from lambda_sample_spark.operators.substring import (
    ORACLE,
    duplicated_spans,
    q_substring_dedup,
    remove_dup_spans,
    substring_dedup_census,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _rand_text(rng: random.Random, n: int) -> str:
    """Unique filler: a 62-char alphabet makes an accidental repeated
    20-gram across a few KB of text essentially impossible."""
    return "".join(rng.choice(string.ascii_letters + string.digits) for _ in range(n))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_planted_cross_doc_passage_localized(spark):
    rng = random.Random(7)
    passage = _rand_text(rng, 30)
    a = _rand_text(rng, 100) + passage + _rand_text(rng, 50)
    b = _rand_text(rng, 40) + passage + _rand_text(rng, 80)
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in duplicated_spans(
            _docs(spark, [(1, a), (2, b)]), min_len=20
        ).collect()
    }
    # 1-based inclusive: passage starts at filler_len+1, runs 30 chars
    assert spans == {1: (101, 130), 2: (41, 70)}


def test_min_length_edge(spark):
    rng = random.Random(11)
    short = _rand_text(rng, 19)  # below L: invisible
    exact = _rand_text(rng, 20)  # exactly L: one gram, one span
    a = _rand_text(rng, 50) + short + _rand_text(rng, 50) + exact
    b = short + _rand_text(rng, 30) + exact + _rand_text(rng, 30)
    out = duplicated_spans(_docs(spark, [(1, a), (2, b)]), min_len=20).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in out}
    # only the 20-char passage is flagged, at its exact extent
    assert got == {(1, 120, 139), (2, 50, 69)}


def test_within_doc_repeat_counts(spark):
    rng = random.Random(13)
    passage = _rand_text(rng, 20)
    # the repeat is WITHIN one doc — occurrences, not docs, are counted
    text = passage + _rand_text(rng, 25) + passage
    out = duplicated_spans(_docs(spark, [(1, text)]), min_len=20).collect()
    got = {(r["span_start"], r["span_end"]) for r in out}
    assert got == {(1, 20), (46, 65)}


def test_remove_dup_spans_rebuilds_remainder(spark):
    rng = random.Random(17)
    passage = _rand_text(rng, 25)
    pre_a, post_a = _rand_text(rng, 60), _rand_text(rng, 40)
    pre_b, post_b = _rand_text(rng, 30), _rand_text(rng, 70)
    docs = _docs(spark, [(1, pre_a + passage + post_a), (2, pre_b + passage + post_b)])
    spans = duplicated_spans(docs, min_len=20)
    cleaned = {r["doc_id"]: r["text"] for r in remove_dup_spans(docs, spans).collect()}
    assert cleaned == {1: pre_a + post_a, 2: pre_b + post_b}


def test_doc_without_spans_passes_through(spark):
    rng = random.Random(19)
    shared = _rand_text(rng, 22)
    clean = _rand_text(rng, 90)
    docs = _docs(
        spark,
        [(1, shared + _rand_text(rng, 10)), (2, _rand_text(rng, 10) + shared), (3, clean)],
    )
    out = {r["doc_id"]: r["text"] for r in remove_dup_spans(docs, duplicated_spans(docs)).collect()}
    assert out[3] == clean


def test_hash_path_equals_oracle_seam(spark):
    docs = (
        spark.read.parquet(f"{SMOKE_SF_DIR}/documents.parquet")
        .selectExpr("doc_id", "text")
    )
    a = sorted(
        map(tuple, substring_dedup_census(docs, gram_col="hash").collect())
    )
    b = sorted(
        map(tuple, substring_dedup_census(docs, gram_col="text").collect())
    )
    assert a == b


def test_contract_row_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    sdf = q_substring_dedup(spark, SMOKE_SF_DIR)
    odf = con.execute(ORACLE["q_substring_dedup"]).fetchdf()
    assert compare("q_substring_dedup", sdf, odf) == []
