"""Phrase-blocklist filtering (operators/blocklist.py): token-boundary
semantics, multi-length phrases, the filter anti-join, and input
guards. The contract row pins the census vs DuckDB cell-exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.operators.blocklist import (
    blocklist_filter,
    blocklist_hits,
)

DOCS = [
    (1, "the quick brown fox"),          # hits: none
    (2, "a slow query ran all night"),   # hits: "slow query"
    (3, "CLASSIFY the Merge results"),   # hits: "merge" (case-insensitive)
    (4, "declassify submerged things"),  # token boundaries: NO hits
    (5, "slow query and merge deluxe"),  # two distinct phrases
    (6, "big table big table"),          # repeated phrase counts once
]
PHRASES = ["merge", "slow query", "big table"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hits_census_semantics(docs):
    got = {
        r["doc_id"]: (r["n_hits"], r["hit"])
        for r in blocklist_hits(docs, PHRASES).collect()
    }
    assert got == {
        1: (0, 0),
        2: (1, 1),
        3: (1, 1),
        4: (0, 0),  # substring-inside-token must NOT match
        5: (2, 1),
        6: (1, 1),  # distinct phrases, not occurrences
    }


def test_filter_drops_flagged(docs):
    kept = {
        r["doc_id"] for r in blocklist_filter(docs, PHRASES).collect()
    }
    assert kept == {1, 4}


def test_seams_agree(docs):
    a = sorted(blocklist_hits(docs, PHRASES).collect(), key=lambda r: r[0])
    b = sorted(
        blocklist_hits(docs, PHRASES, gram_hash="md5").collect(),
        key=lambda r: r[0],
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_guards(docs):
    with pytest.raises(ValueError, match="empty"):
        blocklist_hits(docs, [])
    with pytest.raises(ValueError, match="blank"):
        blocklist_hits(docs, ["ok", "   "])
