"""Bloom-filter decontamination (operators/bloom.py): the contract
row pins the md5-seam arithmetic cell-exactly vs DuckDB; these tests
pin the SEMANTICS against the exact join (no false negatives — the
Bloom guarantee), the two probe executions against each other, and the
sizing math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators import bloom as B
from lambda_sample_spark.operators.curation import contamination_check


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .cache()
    )


@pytest.fixture(scope="module")
def bench(docs):
    return docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bench_id"), "text"
    )


def test_no_false_negatives_and_bounded_fp(docs, bench):
    exact = {
        r["doc_id"]
        for r in contamination_check(docs, bench, n=B.GRAM_N)
        .select("doc_id")
        .distinct()
        .collect()
    }
    probed = B.bloom_probe(docs, B.bloom_build(bench))
    flagged = {r["doc_id"] for r in probed.where("hit = 1").collect()}
    missed = exact - flagged
    assert not missed, f"Bloom false negatives (impossible): {missed}"
    extra = flagged - exact
    n_docs = docs.count()
    assert len(extra) <= max(2, 0.02 * n_docs), (
        f"false-positive docs {len(extra)} exceed 2% of {n_docs}"
    )


def test_inline_and_join_modes_agree(docs, bench):
    bitmap = B.bloom_build(bench)
    words = B.bloom_inline(bitmap)
    a = B.bloom_probe(docs, words, probe_mode="inline").collect()
    b = B.bloom_probe(docs, bitmap, probe_mode="join").collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_bloom_params_textbook():
    m, k = B.bloom_params(1000, 0.01)
    # ~9.59 bits/item and k ~ 7 for 1% fpp
    assert 9500 <= m <= 9700 and m % 32 == 0
    assert k == 7
    with pytest.raises(ValueError):
        B.bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        B.bloom_params(10, 1.5)


def test_inline_cap_guard(docs, bench):
    bitmap = B.bloom_build(bench)
    with pytest.raises(ValueError, match="inline cap"):
        B.bloom_inline(bitmap, m_bits=32 * (B.MAX_INLINE_WORDS + 1))


def test_unknown_probe_mode(docs, bench):
    with pytest.raises(ValueError, match="probe_mode"):
        B.bloom_probe(docs, [0], probe_mode="nope")
