"""Windowing-rule edges for operators/chunking.py (the contract row
pins the full output vs DuckDB; these pin the rule's boundary cases
and the coverage property on crafted docs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.operators.chunking import chunk_documents


def _doc(spark, n_tokens: int):
    text = " ".join(f"w{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


@pytest.mark.parametrize(
    "n,max_t,ov,expect_chunks,last_len",
    [
        (3, 8, 2, 1, 3),     # short doc: one clamped window
        (8, 8, 2, 1, 8),     # exactly max_tokens: one window, no tail
        (9, 8, 2, 2, 3),     # one past: second window from stride=6
        (20, 8, 2, 3, 8),    # 0..7, 6..13, 12..19 — last exactly full
        (21, 8, 2, 4, 3),    # needs a fourth to reach token 20
    ],
)
def test_window_counts_and_tail(spark, n, max_t, ov, expect_chunks, last_len):
    rows = (
        chunk_documents(_doc(spark, n), max_tokens=max_t, overlap=ov)
        .orderBy("chunk_id")
        .collect()
    )
    assert len(rows) == expect_chunks
    assert rows[-1]["n_tokens"] == last_len
    # coverage: the last window reaches the final token
    assert rows[-1]["chunk_start"] + rows[-1]["n_tokens"] == n
    # no dead tails: every window starts before the end
    assert all(r["chunk_start"] < n for r in rows)


def test_reconstruction_and_overlap(spark):
    n, max_t, ov = 50, 16, 4
    rows = (
        chunk_documents(_doc(spark, n), max_tokens=max_t, overlap=ov)
        .orderBy("chunk_id")
        .collect()
    )
    toks = [f"w{i}" for i in range(n)]
    seen = []
    for r in rows:
        words = r["chunk_text"].split(" ")
        assert words == toks[r["chunk_start"]: r["chunk_start"] + max_t]
        # consecutive windows share exactly `overlap` tokens (stride)
        seen.append((r["chunk_start"], words))
    for (s1, w1), (s2, _) in zip(seen, seen[1:]):
        assert s2 - s1 == max_t - ov
    # union covers every token
    covered = set()
    for s, w in seen:
        covered.update(range(s, s + len(w)))
    assert covered == set(range(n))


def test_carry_cols_and_guard(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e", "en")], "doc_id long, text string, lang string"
    )
    out = chunk_documents(df, max_tokens=3, overlap=1, carry_cols=("lang",))
    assert all(r["lang"] == "en" for r in out.collect())
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)
