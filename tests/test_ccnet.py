"""CCNet perplexity bucketing: the stupid-backoff math pinned against
an independent Python reference on a crafted corpus, the three backoff
paths, gibberish-lands-in-tail, bucket monotonicity, and the contract
row vs its DuckDB oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from lambda_sample_spark.operators.ccnet import (
    ORACLE,
    perplexity_buckets,
    q_ccnet_buckets,
    score_docs,
    train_bigram_lm,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

BACKOFF = 0.4


def _ref_scores(train, score, vocab_k=2000, bigram_m=20000):
    """Independent stupid-backoff reference (same spec, no Spark)."""
    by_lang_uni: dict = {}
    by_lang_big: dict = {}
    for _, lang, text in train:
        toks = re.split(r"\s+", text.strip())
        by_lang_uni.setdefault(lang, Counter()).update(toks)
        by_lang_big.setdefault(lang, Counter()).update(zip(toks, toks[1:]))
    lm = {}
    for lang, uni in by_lang_uni.items():
        vocab = dict(
            sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
        )
        total, vsize = sum(vocab.values()), len(vocab)
        big = {
            (w1, w2): c
            for (w1, w2), c in sorted(
                by_lang_big[lang].items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
            )[:bigram_m]
            if w1 in vocab and w2 in vocab
        }
        lm[lang] = (vocab, total, vsize, big)
    out = {}
    for doc_id, lang, text in score:
        vocab, total, vsize, big = lm[lang]
        toks = re.split(r"\s+", text.strip())
        lps = []
        for w1, w2 in zip(toks, toks[1:]):
            if (w1, w2) in big:
                lps.append(math.log(big[(w1, w2)] / vocab[w1]))
            else:
                p_uni = (vocab.get(w2, 0) + 1) / (total + vsize + 1)
                lps.append(math.log(BACKOFF) + math.log(p_uni))
        out[doc_id] = (len(lps), round(-sum(lps) / len(lps), 6))
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


TRAIN = [
    (1, "en", "the cat sat on the mat"),
    (2, "en", "the dog sat on the rug"),
    (3, "en", "a cat and a dog"),
    (4, "fr", "le chat et le chien"),
    (5, "fr", "le chien et le chat"),
]


def test_scores_match_reference_all_backoff_paths(spark):
    """Score docs exercising all three paths: modeled bigram
    ('the cat'), unseen bigram of in-vocab words ('mat dog'), and an
    OOV continuation ('the zzz' -> floor)."""
    score = TRAIN + [
        (10, "en", "the cat sat on the rug"),
        (11, "en", "mat dog mat dog"),
        (12, "en", "the zzz qqq wow"),
        (13, "fr", "le chat et le chien"),
    ]
    lm = train_bigram_lm(_docs(spark, TRAIN))
    got = {
        r["doc_id"]: (r["n_bigrams"], r["nlogp"])
        for r in score_docs(_docs(spark, score), *lm).collect()
    }
    ref = _ref_scores(
        [(d, l, t) for d, l, t in TRAIN],
        [(d, l, t) for d, l, t in score],
    )
    assert set(got) == set(ref)
    for doc_id in ref:
        assert got[doc_id][0] == ref[doc_id][0], doc_id
        assert got[doc_id][1] == pytest.approx(ref[doc_id][1], abs=2e-6), doc_id


def test_vocab_and_bigram_caps_prune_low_count_grams(spark):
    """With vocab_k=3 only the 3 most frequent 'en' words survive;
    everything else backs off to the OOV floor."""
    lm_uni, lm_big, flr = train_bigram_lm(_docs(spark, TRAIN), vocab_k=3)
    vocab = {r["w"] for r in lm_uni.where("lang = 'en'").collect()}
    # en counts: the=4, a=2, cat=2, dog=2, on=2, sat=2 ... top-3 by
    # (cnt desc, token asc) = the, a, cat
    assert vocab == {"the", "a", "cat"}
    for r in lm_big.collect():
        assert r["w1"] in ("the", "a", "cat", "le", "chat", "chien", "et")


def test_gibberish_lands_in_tail(spark):
    """An all-OOV doc scores the floor on every transition and must
    land in the tail bucket of its language."""
    score = TRAIN + [(99, "en", "zxq qzx xqz zqx qxz")]
    lm = train_bigram_lm(_docs(spark, TRAIN))
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(
            score_docs(_docs(spark, score), *lm)
        ).collect()
    }
    assert out[99] == "tail"


def test_bucket_scores_are_monotone_per_lang(spark):
    rows = perplexity_buckets(
        score_docs(
            _docs(spark, TRAIN + [(99, "en", "zxq qzx xqz")]),
            *train_bigram_lm(_docs(spark, TRAIN)),
        )
    ).collect()
    order = {"head": 0, "middle": 1, "tail": 2}
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((order[r["bucket"]], r["nlogp"]))
    for lang, pairs in by_lang.items():
        ranked = sorted(pairs)
        scores = [s for _, s in ranked]
        assert scores == sorted(scores), lang


def test_contract_row_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    sdf = q_ccnet_buckets(spark, SMOKE_SF_DIR)
    odf = con.execute(ORACLE["q_ccnet_buckets"]).fetchdf()
    assert compare("q_ccnet_buckets", sdf, odf) == []
    # every (lang, bucket) cell is populated
    cells = {(r["lang"], r["bucket"]) for r in sdf.collect()}
    assert len(cells) == 15
