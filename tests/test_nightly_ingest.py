"""The steady-state composition (examples/nightly_ingest.py): N
nightly batches through minhash ingest + cc label upkeep + versioned
corpus merge + ANN index append, checked against a single-shot run —
the claims that make the incremental operators a pipeline rather than
four isolated tricks: labels ≡ full CC recompute over every ingested
edge; the corpus is a consistent superset of the one-shot survivors
(dedup-vs-kept-docs breaks transitive chains at batch boundaries, by
design — surplus is bounded and fully explained); the ANN index stays
in lockstep with the corpus and serves every batch's rows."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from examples.nightly_ingest import nightly_ingest
from lambda_sample_spark.functions.vectors import as_double
from lambda_sample_spark.io import load_table
from lambda_sample_spark.sources.warehouse import read_versioned


pytestmark = pytest.mark.slow  # live-service/load/scale tier (round-16 task 1)


@pytest.fixture(scope="module")
def state(spark, sf_dir, tmp_path_factory):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    inc_dir = str(tmp_path_factory.mktemp("nightly") / "incremental")
    one_dir = str(tmp_path_factory.mktemp("nightly") / "oneshot")
    cuts = [0, 170, 340, 10**9]
    nightly_stats = [
        nightly_ingest(
            spark,
            inc_dir,
            docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            emb.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
        )
        for lo, hi in zip(cuts, cuts[1:])
    ]
    oneshot_stats = nightly_ingest(spark, one_dir, docs, emb)
    return inc_dir, one_dir, nightly_stats, oneshot_stats


def test_corpus_store_is_consistent_superset_of_single_shot(spark, state):
    # The steady-state criterion dedups each batch against KEPT docs
    # (the index stores survivors' bands only — incremental_dedup's
    # documented contract), so a transitive chain A~B~C split across
    # nights can keep C when the one-shot run drops it (its only link
    # B was dropped before C arrived). The guarantees that DO hold,
    # split-invariantly: no false dups (one-shot survivors all
    # survive), the chain-break surplus is exactly one-shot-flagged
    # dups, and it stays small.
    inc_dir, one_dir, nightly_stats, oneshot_stats = state
    a = {
        r.doc_id
        for r in read_versioned(spark, f"{inc_dir}/corpus").select("doc_id").collect()
    }
    b = {
        r.doc_id
        for r in read_versioned(spark, f"{one_dir}/corpus").select("doc_id").collect()
    }
    assert b <= a, f"one-shot kept docs the incremental run dropped: {b - a}"
    one_flags = spark.read.parquet(f"{one_dir}/minhash_index/ingest_log/*")
    one_dups = {r.doc_id for r in one_flags.where(F.col("is_near_dup")).collect()}
    assert (a - b) <= one_dups  # every surplus survivor is a broken chain
    assert len(a - b) <= max(3, len(a) // 5), (len(a), len(b))
    # the gate actually removed something, or the claim is vacuous
    assert nightly_stats[-1]["corpus"] < sum(s["batch"] for s in nightly_stats)


def test_labels_equal_full_recompute_over_ingested_edges(spark, state):
    # label upkeep ≡ full recompute: the incrementally-maintained
    # (node, comp) table must equal connected_components run ONCE over
    # the union of every night's (doc, rep) edges — the cc_ingest
    # star-fold loses nothing across N batches
    from lambda_sample_spark.operators.graph import connected_components

    inc_dir, one_dir, *_ = state
    a = {
        (r.node, r.comp)
        for r in read_versioned(spark, f"{inc_dir}/labels").collect()
    }
    logs = spark.read.parquet(f"{inc_dir}/minhash_index/ingest_log/*")
    edges = logs.where(F.col("is_near_dup")).select(
        F.col("doc_id").alias("src"), F.col("rep_id").alias("dst")
    )
    full = connected_components(
        edges, nodes=logs.select("doc_id"), scratch_dir=None
    )
    b = {(r.node, r.comp) for r in full.collect()}
    assert a == b and len(a) > 0
    # every doc labeled exactly once
    assert len({n for n, _ in a}) == len(a)


def test_labels_consistent_with_dedup_decisions(spark, state):
    # a doc and its kept representative must share a component; a
    # surviving doc with no near-dup edge is its own component
    inc_dir, *_ = state
    labels = {r.node: r.comp for r in read_versioned(spark, f"{inc_dir}/labels").collect()}
    logs = spark.read.parquet(f"{inc_dir}/minhash_index/ingest_log/*")
    for r in logs.collect():
        if r.is_near_dup:
            assert labels[r.doc_id] == labels[r.rep_id], (r.doc_id, r.rep_id)


def test_ann_index_serves_all_batches(spark, state):
    # rows appended on nights 2-3 are as retrievable as night-1 rows:
    # probing with any stored vector returns itself at rank 1
    from lambda_sample_spark.operators.pq import ivfpq_probe_index

    inc_dir, one_dir, *_ = state
    cells = spark.read.parquet(f"{inc_dir}/ann_index/cells")
    # one probe per night's id range, taken from the stored cells
    probes = []
    for lo, hi in ((0, 170), (170, 340), (340, 10**9)):
        row = (
            cells.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select("vec_id", "vec")
            .orderBy("vec_id")
            .first()
        )
        assert row is not None, f"no ANN rows from batch [{lo},{hi})"
        # probe under a DISJOINT q_id (the scorer excludes c_id == q_id
        # as self): the stored copy of the same vector must then be
        # the exact top hit
        probes.append((9_000_000 + int(row.vec_id), list(row.vec)))
    got = ivfpq_probe_index(spark, f"{inc_dir}/ann_index", probes).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for q, _ in probes:
        top = min(by_q[q], key=lambda r: r.rank)
        assert top.c_id == q - 9_000_000 and top.cos_sim > 0.999, (q, top)


def test_incremental_index_rows_equal_incremental_corpus(spark, state):
    # every survivor's embedding is indexed, none twice — the ANN
    # index and the corpus store stay in lockstep across N appends
    inc_dir, one_dir, *_ = state
    cells = spark.read.parquet(f"{inc_dir}/ann_index/cells")
    corpus = read_versioned(spark, f"{inc_dir}/corpus")
    assert {r.vec_id for r in cells.select("vec_id").collect()} == {
        r.doc_id for r in corpus.select("doc_id").collect()
    }
    assert cells.count() == corpus.count()


def test_quality_model_refresh_equals_full_retrain(spark, state):
    """Stage 5: the nightly-folded NB model's sufficient statistics
    equal one training pass over the full corpus store (exact integer
    censuses merge losslessly), so the derived weights are identical."""
    import os

    from lambda_sample_spark.operators.classifier import (
        load_nb_model,
        train_nb,
    )
    from lambda_sample_spark.sources.warehouse import current_version

    inc_dir, _, nightly_stats, _ = state
    model_root = os.path.join(inc_dir, "quality_model")
    assert current_version(model_root) == len(
        nightly_stats
    )
    corpus = read_versioned(spark, os.path.join(inc_dir, "corpus"))
    w_full, c_full = train_nb(
        corpus.select("doc_id", "text"), F.col("doc_id") % 2 == 0, n=1
    )
    w_inc, c_inc = load_nb_model(spark, model_root)
    key = lambda r: r["bucket"]  # noqa: E731
    assert sorted(w_inc.collect(), key=key) == sorted(
        w_full.collect(), key=key
    )
    assert c_inc.collect() == c_full.collect()
