"""Span-corruption edges (operators/corruption.py) — the contract row
hash-compares the full strings vs DuckDB; these pin the rule's
structure on crafted docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.corruption import (
    BLOCK,
    MIN_SPAN,
    SPAN_CHOICES,
    span_corrupt,
)


def _doc(spark, n_tokens: int, doc_id: int = 1):
    text = " ".join(f"w{i}" for i in range(n_tokens))
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_short_doc_degenerate_pair(spark):
    r = span_corrupt(_doc(spark, BLOCK - 1)).collect()[0]
    assert r["n_spans"] == 0
    assert r["input_text"] == " ".join(f"w{i}" for i in range(BLOCK - 1))
    assert r["target_text"] == "<extra_id_0>"


def test_structure_and_reconstruction(spark):
    n = 3 * BLOCK + 5  # three full blocks + tail
    r = span_corrupt(_doc(spark, n)).collect()[0]
    assert r["n_spans"] == 3
    inp, tgt = r["input_text"].split(" "), r["target_text"].split(" ")
    # exactly one sentinel per block in the input, in order
    sentinels = [w for w in inp if w.startswith("<extra_id_")]
    assert sentinels == [f"<extra_id_{k}>" for k in range(3)]
    # target: sentinel k, its span tokens, ..., final sentinel
    assert tgt[0] == "<extra_id_0>" and tgt[-1] == "<extra_id_3>"
    # splice targets back into the input -> original document
    spans: dict[str, list[str]] = {}
    cur = None
    for w in tgt[:-1]:
        if w.startswith("<extra_id_"):
            cur = w
            spans[cur] = []
        else:
            spans[cur].append(w)
    rebuilt: list[str] = []
    for w in inp:
        rebuilt.extend(spans[w] if w in spans else [w])
    assert rebuilt == [f"w{i}" for i in range(n)]
    # span lengths within the configured range, density = 1 per block
    for k in range(3):
        assert MIN_SPAN <= len(spans[f"<extra_id_{k}>"]) <= (
            MIN_SPAN + SPAN_CHOICES - 1
        )


def test_deterministic_and_seam_disjoint(spark):
    df = _doc(spark, 64)
    a = span_corrupt(df).collect()[0]
    b = span_corrupt(df).collect()[0]
    assert a == b
    # md5 seam draws DIFFERENT spans (different PRN) but same structure
    c = span_corrupt(df, gram_hash="md5").collect()[0]
    assert c["n_spans"] == a["n_spans"]


def test_spans_never_cross_block_boundaries(spark):
    rows = span_corrupt(_doc(spark, 10 * BLOCK)).collect()[0]
    inp = rows["input_text"].split(" ")
    # walk the input reconstructing positions; every sentinel's hidden
    # span must fall inside its own block
    tgt = rows["target_text"].split(" ")
    spans: dict[str, int] = {}
    cur = None
    for w in tgt[:-1]:
        if w.startswith("<extra_id_"):
            cur = w
            spans[cur] = 0
        else:
            spans[cur] += 1
    pos = 0
    for w in inp:
        if w in spans:
            k = int(w[len("<extra_id_"):-1])
            assert k * BLOCK <= pos and pos + spans[w] <= (k + 1) * BLOCK
            pos += spans[w]
        else:
            pos += 1
    assert pos == 10 * BLOCK
