"""Randomized third-implementation cross-checks: pure-Python twins of
the session-5 windowing/matching rules, compared row-by-row against
the Spark operators on seeded random corpora. The Spark↔DuckDB oracle
pins ENGINE agreement, but both sides could share a misreading of the
RULE — an independent Python twin can't (it shares no expression
code with either)."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from lambda_sample_spark.operators.blocklist import blocklist_hits
from lambda_sample_spark.operators.chunking import chunk_documents
from lambda_sample_spark.operators.corruption import (
    BLOCK,
    MIN_SPAN,
    SPAN_CHOICES,
    span_corrupt,
)


def _rand_docs(spark, seed: int, n_docs: int = 120, vocab: int = 40):
    rng = random.Random(seed)
    rows = [
        (
            i,
            " ".join(
                f"w{rng.randrange(vocab)}"
                for _ in range(rng.randrange(1, 90))
            ),
        )
        for i in range(n_docs)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def _md5_word(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_chunking_python_twin(spark):
    rows, docs = _rand_docs(spark, 101)
    max_t, ov = 12, 5
    stride = max_t - ov
    got = {
        (r["doc_id"], r["chunk_id"]): (
            r["chunk_start"], r["n_tokens"], r["chunk_text"]
        )
        for r in chunk_documents(docs, max_tokens=max_t, overlap=ov).collect()
    }
    expect = {}
    for doc_id, text in rows:
        toks = text.split()
        n = len(toks)
        start, cid = 0, 0
        while True:
            win = toks[start: start + max_t]
            expect[(doc_id, cid)] = (start, len(win), " ".join(win))
            if start + max_t >= n:
                break
            start += stride
            cid += 1
    assert got == expect


def test_span_corruption_python_twin(spark):
    rows, docs = _rand_docs(spark, 202)
    got = {
        r["doc_id"]: (r["n_spans"], r["input_text"], r["target_text"])
        for r in span_corrupt(docs, gram_hash="md5").collect()
    }
    for doc_id, text in rows:
        toks = text.split()
        nb = len(toks) // BLOCK
        inp, tgt = [], []
        pos = 0
        for b in range(nb):
            ln = MIN_SPAN + _md5_word(f"sc1:{doc_id}:{b}") % SPAN_CHOICES
            off = _md5_word(f"sc2:{doc_id}:{b}") % (BLOCK + 1 - ln)
            s = b * BLOCK + off
            inp += toks[b * BLOCK: s] + [f"<extra_id_{b}>"] + toks[
                s + ln: (b + 1) * BLOCK
            ]
            tgt += [f"<extra_id_{b}>"] + toks[s: s + ln]
            pos = (b + 1) * BLOCK
        inp += toks[pos:] if nb else toks
        tgt += [f"<extra_id_{nb}>"]
        assert got[doc_id] == (nb, " ".join(inp), " ".join(tgt)), doc_id


def test_blocklist_python_twin(spark):
    rng = random.Random(303)
    rows, docs = _rand_docs(spark, 303, vocab=25)
    # phrases sampled FROM the vocabulary space, lengths 1-3, some
    # guaranteed absent
    phrases = [
        " ".join(f"w{rng.randrange(25)}" for _ in range(k))
        for k in (1, 1, 2, 2, 3)
    ] + ["nevermatches", "also never matches"]
    got = {
        r["doc_id"]: (r["n_hits"], r["hit"])
        for r in blocklist_hits(docs, phrases).collect()
    }
    norm = sorted({" ".join(p.lower().split()) for p in phrases})
    for doc_id, text in rows:
        toks = text.lower().split()
        found = set()
        for p in norm:
            pt = p.split()
            L = len(pt)
            grams = (
                [" ".join(toks[i: i + L]) for i in range(len(toks) - L + 1)]
                if len(toks) >= L
                else [" ".join(toks)]  # the clamped short-doc gram
            )
            if p in grams:
                found.add(p)
        assert got[doc_id] == (len(found), 1 if found else 0), doc_id
