"""Round-12 advice fixes, each pinned by the failure it closes:

  1. substring_scrub.batch_committed must survive an interleaved
     commit on the shared gram-counts index (the replay-skip marker
     scan now covers the retained version history, not just the
     current pointer) — and must never trust an orphan version dir.
  2. contract.oracle_sql builds lazy oracles once per SF (cached) and
     degrades a failed build to rows-only instead of raising for
     every caller.
  3. similarity.ivf_index fits on the vec_id-ORDERED prefix, so a
     multi-file / reordered layout cannot desync the Spark fit sample
     from the DuckDB oracle's.
  4. classifier.nb_update / has_nb_model handle the legacy per-table
     versioned layout (no silent retrain-from-scratch on old state
     dirs).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lambda_sample_spark.operators import classifier as C
from lambda_sample_spark.operators import similarity as sim
from lambda_sample_spark.sources.warehouse import (
    _write_version_meta,
    current_version,
    list_versions,
    versioned_path,
    write_versioned,
)
from lambda_sample_spark.streaming.substring_scrub import batch_committed


def test_batch_committed_survives_interleaved_commit(spark, tmp_path):
    root = str(tmp_path / "gram_counts")
    df = spark.range(3).selectExpr("id AS gram", "1 AS cnt")

    write_versioned(df, root, meta="tok:0")
    assert batch_committed(root, "tok", 0)

    # an unrelated commit lands on the same index (manual scrub_batch
    # without commit_meta, nightly maintenance, a second stream) — the
    # CURRENT version's meta no longer names this run, but the retained
    # v=1 still does; before the fix this returned False and the replay
    # double-merged the batch's gram counts
    write_versioned(df, root)
    assert batch_committed(root, "tok", 0)

    # monotone-id contract: a later marker covers earlier batch ids...
    write_versioned(df, root, meta="tok:3")
    assert batch_committed(root, "tok", 2)
    # ...but never future ones, and never another run's token
    assert not batch_committed(root, "tok", 4)
    assert not batch_committed(root, "other", 0)


def test_batch_committed_ignores_orphan_version(spark, tmp_path):
    """A writer that crashed between the meta write and the pointer
    swap leaves v=N with _COMMIT_META but an older pointer: that merge
    did NOT commit, so the replay must re-run it."""
    root = str(tmp_path / "gram_counts")
    df = spark.range(3).selectExpr("id AS gram", "1 AS cnt")
    write_versioned(df, root, meta="tok:0")

    orphan = versioned_path(root, 5)
    os.makedirs(orphan)
    _write_version_meta(root, 5, "tok:7")

    assert current_version(root) == 1
    assert list_versions(root) == [1]  # committed_only filters the orphan
    assert not batch_committed(root, "tok", 7)


def test_oracle_sql_lazy_entries_cached_and_degrade(monkeypatch):
    from lambda_sample_spark import contract

    calls = {"n": 0}
    real = sim.ORACLE["q_semantic_dedup"]
    assert callable(real)

    def counting():
        calls["n"] += 1
        return real()

    monkeypatch.setitem(sim.ORACLE, "q_semantic_dedup", counting)
    monkeypatch.setattr(contract, "_LAZY_ORACLE_CACHE", {})
    monkeypatch.setenv(sim.ORACLE_SF_ENV, "/root/testdata/sf0.001")

    first = contract.oracle_sql()
    second = contract.oracle_sql()
    assert calls["n"] == 1, "lazy oracle rebuilt despite cache"
    assert first["q_semantic_dedup"] == second["q_semantic_dedup"]

    # missing parquet: THAT entry degrades to absent (rows-only at the
    # gate); every other oracle is still served, nothing raises
    monkeypatch.setenv(sim.ORACLE_SF_ENV, "/tmp/definitely_missing_sf")
    degraded = contract.oracle_sql()
    assert "q_semantic_dedup" not in degraded
    assert "q_similarity_topk" in degraded
    assert calls["n"] == 2  # failure is not cached; a later call retries
    contract.oracle_sql()
    assert calls["n"] == 3


def test_ivf_fit_sample_is_vecid_ordered(spark):
    """Rows arriving reversed across several partitions must produce
    the same centroids as the vec_id-ordered prefix — a bare limit()
    would hand the fit whatever partition Spark scans first."""
    import numpy as np

    data = [(i, [float(i % 7), float((3 * i) % 5), 1.0]) for i in range(60)]
    emb = spark.createDataFrame(
        list(reversed(data)), "vec_id long, vec array<double>"
    ).repartition(4)
    cents, _ = sim.ivf_index(emb, k=3, fit_cap=20)

    expected = sim._fit_centroids_np([v for _, v in data[:20]], 3, 8)
    got = {r["cluster"]: r["cvec"] for r in cents.collect()}
    for i, row in enumerate(expected):
        assert np.allclose(got[i], row, atol=0, rtol=0), f"centroid {i} desync"


def test_nb_update_handles_legacy_per_table_layout(spark, tmp_path):
    from tests.test_classifier import _planted_docs

    docs = _planted_docs(spark, n_docs=120)
    lbl = F.col("y") == 1
    b1 = docs.where("doc_id < 60")
    b2 = docs.where("doc_id >= 60")
    model_dir = str(tmp_path / "legacy_model")

    # legacy layout: per-table versioned dirs, no model-level pointer
    census, priors = C.nb_census(b1, lbl, n=1)
    write_versioned(census, f"{model_dir}/census")
    write_versioned(priors, f"{model_dir}/priors")
    assert current_version(model_dir) is None
    assert C.has_nb_model(model_dir)  # the branch check callers must use

    C.nb_update(spark, model_dir, b2, lbl, n=1)

    # the update merged the ACCUMULATED census (not retrained on b2
    # alone): incremental model == full retrain, bit-for-bit
    w_inc, c_inc = C.load_nb_model(spark, model_dir)
    w_full, c_full = C.train_nb(docs, lbl, n=1)
    key = lambda r: r["bucket"]  # noqa: E731
    assert sorted(w_inc.collect(), key=key) == sorted(w_full.collect(), key=key)
    assert c_inc.collect() == c_full.collect()
    # and the commit migrated the model to the model-level pointer
    assert current_version(model_dir) == 1


def test_changed_rows_selector(monkeypatch):
    """Task #8's row selector: operator-module changes map to exactly
    that module's rows; shared engine code forces the full gate;
    tooling/tests/artifacts select nothing."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        import changed_rows as cr
    finally:
        sys.path.pop(0)

    def with_files(files):
        monkeypatch.setattr(cr, "changed_files", lambda ref="HEAD": files)
        return cr.rows_for_diff()

    dedup_rows = with_files(["lambda_sample_spark/operators/dedup.py"])
    assert dedup_rows is not None and "q_dedup_exact" in dedup_rows
    assert "q_tpch_q1" not in dedup_rows

    assert with_files(["lambda_sample_spark/operators/common.py"]) is None
    assert with_files(["__spark_entry__.py"]) is None
    assert with_files(["tests/test_foo.py", "bench.py", "docs/SCALE.md"]) == set()
