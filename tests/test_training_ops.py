"""Training-pipeline utilities: determinism, budget, and coverage
properties (operators/training.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.common import documents
from lambda_sample_spark.operators.training import (
    build_vocab,
    pack_documents,
    split_by_hash,
    stratified_sample,
)


def test_stratified_sample_deterministic_and_close(spark, sf_dir):
    docs = documents(spark, sf_dir)
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    fractions = {langs[0]: 0.5, **{l: 0.1 for l in langs[1:]}}
    s1 = stratified_sample(docs, fractions)
    s2 = stratified_sample(docs, fractions)
    assert s1.exceptAll(s2).count() == 0  # same rows every run
    got = {
        r.lang: r.n
        for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, frac in fractions.items():
        if totals.get(lang, 0) >= 30:
            rate = got.get(lang, 0) / totals[lang]
            assert abs(rate - frac) < 0.15, (lang, rate, frac)


def test_build_vocab_dense_deterministic(spark, sf_dir):
    vocab = build_vocab(documents(spark, sf_dir), top_n=20).collect()
    ids = [r.token_id for r in vocab]
    assert ids == list(range(len(vocab)))
    counts = [r.cnt for r in vocab]
    assert counts == sorted(counts, reverse=True)
    assert len({r.token for r in vocab}) == len(vocab)


def test_split_by_hash_total_and_stable(spark, sf_dir):
    docs = documents(spark, sf_dir)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s = split_by_hash(docs, w).cache()
    try:
        assert s.where(F.col("split").isNull()).count() == 0
        n = s.count()
        by = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert 0.7 < by.get("train", 0) / n < 0.9
        # stability: a subset gets identical assignments
        sub = split_by_hash(docs.where(F.col("doc_id") % 2 == 0), w)
        joined = s.select("doc_id", F.col("split").alias("a")).join(
            sub.select("doc_id", F.col("split").alias("b")), "doc_id"
        )
        assert joined.where(F.col("a") != F.col("b")).count() == 0
    finally:
        s.unpersist()


def test_pack_documents_budget_and_coverage(spark, sf_dir):
    docs = documents(spark, sf_dir)
    budget = 200
    packed = pack_documents(docs, budget, n_shards=8).cache()
    try:
        assert packed.count() == docs.count()  # every doc assigned
        assert packed.where(F.col("offset") < 0).count() == 0
        assert packed.where(F.col("offset") >= budget).count() == 0
        # deterministic across runs
        again = pack_documents(docs, budget, n_shards=8)
        assert packed.exceptAll(again).count() == 0
        # a bin's content stays within budget + one overflowing doc
        fill = packed.groupBy("grp", "bin_id").agg(
            F.sum("n_tokens").alias("fill"), F.max("n_tokens").alias("biggest")
        )
        over = fill.where(F.col("fill") > budget + F.col("biggest")).count()
        assert over == 0
        # sharding actually spreads work: > 1 shard stripe populated
        stripes = packed.select((F.col("bin_id") % 8).alias("s")).distinct().count()
        assert stripes > 1
    finally:
        packed.unpersist()


def test_quality_gate_filters_and_observes_in_one_pass(spark):
    from lambda_sample_spark.operators.training import quality_gate

    rows = [
        (1, "a" * 50, 50),     # ok
        (2, "b" * 5, 5),       # too short
        (3, "   ", 3),         # blank
        (4, "d" * 200, 200),   # ok
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, n_chars INT")
    gated, obs = quality_gate(docs, min_chars=10, max_chars=100)
    kept = gated.collect()  # one action drives both filter and metrics
    assert {r.doc_id for r in kept} == {1}  # 200 chars > max -> dropped too
    m = obs.get
    assert m["n_input"] == 4
    assert m["n_bad_length"] == 3  # ids 2 (short), 3 (short), 4 (long)
    assert m["n_bad_text"] == 1    # id 3


def test_unigram_logprob_ranks_gibberish_low(spark, sf_dir):
    from lambda_sample_spark.operators.training import (
        build_vocab,
        unigram_logprob_score,
    )

    corpus = documents(spark, sf_dir)
    vocab = build_vocab(corpus, top_n=100)
    # a corpus-typical doc (common tokens) vs out-of-vocabulary noise
    typical = " ".join(r.token for r in vocab.orderBy("token_id").limit(10).collect())
    probe = spark.createDataFrame(
        [(900001, typical), (900002, "zzq qqz xzx vvw wvv qqq zzz xxy yyx wyz")],
        "doc_id BIGINT, text STRING",
    )
    scores = {
        r.doc_id: r.avg_logprob
        for r in unigram_logprob_score(probe, vocab).collect()
    }
    assert scores[900001] > scores[900002]
    # and both are finite negatives
    assert all(-100 < v < 0 for v in scores.values())


def test_weighted_sample_matches_python_twin_and_favors_weight(spark):
    # deterministic A-Res: the exact top-k is reproducible in pure
    # Python from the same md5 seam — assert set equality, not just
    # statistics
    import hashlib
    import math

    from lambda_sample_spark.operators.training import weighted_sample

    rows = [(i, (i % 7 + 1) * 100) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, n_chars BIGINT")

    def score(i, w):
        word = int(hashlib.md5(f"ws{i}".encode()).hexdigest()[:8], 16)
        u = (word + 0.5) / 2**32
        return math.log(u) / max(w, 1)

    want = sorted(rows, key=lambda r: (-score(*r), r[0]))[:10]
    got = weighted_sample(docs, "n_chars", k=10, hash="md5").collect()
    assert [(r["doc_id"], r["w"]) for r in got] == want
    # weight-proportional selection: the sampled mean weight must sit
    # well above the population mean (weights span 100..700)
    pop_mean = sum(w for _, w in rows) / len(rows)
    got_mean = sum(r["w"] for r in got) / len(got)
    assert got_mean > pop_mean


def test_weighted_sample_production_twin_same_shape(spark):
    # xxhash64 path: same contract (k rows, deterministic repeat),
    # different draw
    from lambda_sample_spark.operators.training import weighted_sample

    docs = spark.createDataFrame(
        [(i, 100) for i in range(50)], "doc_id BIGINT, n_chars BIGINT"
    )
    a = weighted_sample(docs, "n_chars", k=20).collect()
    b = weighted_sample(docs, "n_chars", k=20).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 20


def test_build_mixture_proportion_accuracy(spark, sf_dir):
    """Per-source selected tokens land in [budget, budget + one doc)
    when the source has enough material — the mixture actually hits
    its proportions in token space."""
    from lambda_sample_spark.operators.training import (
        MIXTURE_TARGETS,
        MIXTURE_TOTAL,
        build_mixture,
    )

    docs = documents(spark, sf_dir).select("doc_id", "source", "text")
    sel = build_mixture(docs, MIXTURE_TARGETS, MIXTURE_TOTAL).collect()
    per_src: dict = {}
    max_doc: dict = {}
    for r in sel:
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["n_tokens"]
        max_doc[r["source"]] = max(max_doc.get(r["source"], 0), r["n_tokens"])
    for s, p in MIXTURE_TARGETS.items():
        budget = int(MIXTURE_TOTAL * p)
        assert budget <= per_src[s] < budget + max_doc[s], (
            s, per_src[s], budget
        )


def test_build_mixture_exhausted_source_contributes_everything(spark):
    from lambda_sample_spark.operators.training import build_mixture

    rows = [(i, "tiny" if i < 3 else "big", "w " * 50) for i in range(40)]
    docs = spark.createDataFrame(
        [(i, s, t.strip()) for i, s, t in rows],
        "doc_id bigint, source string, text string",
    )
    sel = build_mixture(docs, {"tiny": 0.5, "big": 0.5}, 2000).collect()
    tiny = [r for r in sel if r["source"] == "tiny"]
    # 'tiny' has 3 docs x 50 tokens = 150 < its 1000-token budget:
    # everything it has is taken, nothing borrowed from elsewhere
    assert len(tiny) == 3 and sum(r["n_tokens"] for r in tiny) == 150
    big = sum(r["n_tokens"] for r in sel if r["source"] == "big")
    assert 1000 <= big < 1050


def test_build_mixture_untargeted_source_dropped_and_packs(spark):
    from lambda_sample_spark.operators.training import build_mixture

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "tok " * 20) for i in range(30)],
        "doc_id bigint, source string, text string",
    )
    sel = build_mixture(docs, {"s0": 0.6, "s1": 0.4}, 400)
    assert sel.where("source = 's2'").count() == 0
    packed = build_mixture(
        docs, {"s0": 0.6, "s1": 0.4}, 400, pack_budget=64, n_shards=2
    )
    rows = packed.collect()
    assert set(packed.columns) == {"grp", "bin_id", "doc_id", "n_tokens", "offset"}
    assert {r["grp"] for r in rows} == {"s0", "s1"}
    assert all(0 <= r["offset"] < 64 for r in rows)


def test_mixture_census_contract_vs_oracle(spark, sf_dir):
    from lambda_sample_spark.operators.training import ORACLE, q_data_mixture
    from tests.oracle_harness import compare, duckdb_con

    con = duckdb_con(sf_dir)
    sdf = q_data_mixture(spark, sf_dir)
    odf = con.execute(ORACLE["q_data_mixture"]).fetchdf()
    assert compare("q_data_mixture", sdf, odf) == []


def test_unimax_budgets_waterfill():
    from lambda_sample_spark.operators.training import unimax_budgets

    # uniform when nobody saturates
    assert unimax_budgets({"a": 100, "b": 100}, 100) == {"a": 50, "b": 50}
    # tiny key caps at max_epochs * available, surplus redistributes
    out = unimax_budgets({"a": 1000, "b": 1000, "c": 10}, 600, max_epochs=1.0)
    assert out["c"] == 10
    assert out["a"] == out["b"] == 295
    assert sum(out.values()) == 600
    # total above the cap sum returns everything available
    out = unimax_budgets({"a": 5, "b": 7}, 1000, max_epochs=2.0)
    assert out == {"a": 10, "b": 14}
    # epoch cap below 1 shrinks each key's ceiling
    out = unimax_budgets({"a": 100, "b": 100}, 1000, max_epochs=0.5)
    assert out == {"a": 50, "b": 50}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        unimax_budgets({"a": 1}, -1)
    with _pytest.raises(ValueError):
        unimax_budgets({"a": 1}, 1, max_epochs=0)


def test_temperature_mixture_composes(spark):
    from lambda_sample_spark.operators.training import (
        temperature_mixture,
        temperature_shares,
    )

    # 3 sources with 10x token skew; T=2 must pull shares toward
    # uniform relative to the natural proportions
    docs = spark.createDataFrame(
        [
            (i, "big" if i < 100 else ("mid" if i < 130 else "small"),
             "tok " * (20 if i < 100 else 10))
            for i in range(140)
        ],
        "doc_id bigint, source string, text string",
    )
    shares = {
        r["key"]: r["share"]
        for r in temperature_shares(docs, key_col="source").collect()
    }
    nat_big = 2000 / (2000 + 300 + 100)
    assert shares["big"] < nat_big  # flattened toward uniform
    assert shares["small"] > 100 / 2400
    sel = temperature_mixture(docs, 2.0, 600, key_col="source")
    got = {
        r["source"]: r["cnt"]
        for r in sel.groupBy("source")
        .agg(F.sum("n_tokens").alias("cnt"))
        .collect()
    }
    # every source lands within one doc of its temperature budget
    assert set(got) == {"big", "mid", "small"}
    assert sum(got.values()) <= 600 + 3 * 20
