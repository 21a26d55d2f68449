"""Product quantization: recall of the numpy ADC lane vs exact search
on a planted-cluster corpus, encode determinism and code domain,
compression arithmetic, IVF-PQ refinement recall, and the relational
contract row against its DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest

from lambda_sample_spark.plans.audit import simple_plan
from pyspark.sql import functions as F

from lambda_sample_spark.operators.pq import (
    ORACLE,
    ivfpq_probe_index,
    ivfpq_search,
    ivfpq_write_index,
    pq_adc_topk,
    pq_encode,
    pq_train,
    q_pq_adc_topk,
)
from tests.oracle_harness import compare, duckdb_con


@pytest.fixture(scope="module")
def clustered(spark):
    """Planted-cluster corpus (the test_similarity_scale fixture
    recipe): 3000 unit vectors in 40 clusters, 32 dims — the regime
    real embedding corpora live in."""
    rng = np.random.default_rng(23)
    n, dim, n_clusters = 3000, 32, 40
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, n_clusters, size=n)] + 0.15 * rng.normal(
        size=(n, dim)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id BIGINT, vec ARRAY<DOUBLE>",
    )
    sims = pts[:5] @ pts.T
    exact = {}
    for qi in range(5):
        s = sims[qi].copy()
        s[qi] = -2.0
        exact[qi] = set(np.argsort(-s)[:10].tolist())
    queries = [(i, pts[i].tolist()) for i in range(5)]
    return emb, pts, exact, queries


def test_adc_recall_on_clustered_corpus(spark, clustered):
    emb, pts, exact, queries = clustered
    # measured trade on this fixture (no residuals, no refinement):
    # (m=8,ks=64) 0.40, (8,256) 0.52, (16,64) 0.74, (16,256) 0.84 —
    # within-cluster ranking is plain PQ's weak regime, and bytes buy
    # it back; 16 bytes/vector (16x at 32-dim float64) is the honest
    # standalone-ADC operating point, and exact refinement (next test)
    # recovers the rest at 8
    books = pq_train(emb, m=16, ks=256)
    encoded = pq_encode(emb, books)
    got = pq_adc_topk(encoded, queries, books).collect()
    recall = sum(1 for r in got if r.c_id in exact[r.q_id]) / 50
    assert recall >= 0.75, f"ADC recall@10 {recall}"


def test_ivfpq_refined_recall(spark, clustered):
    emb, pts, exact, queries = clustered
    got = ivfpq_search(emb, queries, n=3000).collect()
    recall = sum(1 for r in got if r.c_id in exact[r.q_id]) / 50
    # exact re-rank of the ADC survivors inside probed cells recovers
    # IVF-Flat-grade recall at PQ scan cost (residual mode measured
    # 1.0 here; raw-vector mode 0.94)
    assert recall >= 0.9, f"IVF-PQ refined recall@10 {recall}"
    # the exact lane reports true cosine: every score within [-1, 1]
    assert all(-1.0001 <= r.cos_sim <= 1.0001 for r in got)


def test_residual_beats_raw_at_same_bytes(spark, clustered):
    # the Jégou residual design, pinned end-to-end through the cell
    # router at 8 bytes/vector with refine=1 (the top-k IS the ADC
    # set, so this measures code quality, not the exact re-ranker):
    # measured residual 0.72 vs raw 0.40 on this fixture
    emb, pts, exact, queries = clustered

    def recall(residual):
        got = ivfpq_search(
            emb, queries, n=3000, refine=1, m=8, ks=64, residual=residual
        ).collect()
        return sum(1 for r in got if r.c_id in exact[r.q_id]) / 50

    r_res, r_raw = recall(True), recall(False)
    assert r_res >= 0.6, f"residual ADC recall@10 {r_res}"
    assert r_res >= r_raw + 0.15, f"residual {r_res} vs raw {r_raw}"


def test_persisted_ivfpq_index_probe(spark, clustered, tmp_path):
    # the persisted layout end-to-end: write (cluster-partitioned
    # cells + centroids + codebook), probe from a fresh read. The
    # cells scan must carry the probed clusters as a PARTITION filter
    # (pruning IS candidate selection) and recall must match the
    # in-memory residual path's grade.
    emb, pts, exact, queries = clustered
    path = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, path, n=3000)
    out = ivfpq_probe_index(spark, path, queries)
    plan = simple_plan(out)
    pfs = [seg.split("]")[0] for seg in plan.split("PartitionFilters: [")[1:]]
    assert any("cluster" in p and "IN" in p for p in pfs), plan[:1500]
    got = out.collect()
    recall = sum(1 for r in got if r.c_id in exact[r.q_id]) / 50
    assert recall >= 0.9, f"persisted IVF-PQ recall@10 {recall}"


def test_append_reencodes_identically(spark, clustered, tmp_path):
    # appending a vector the index already holds must reproduce its
    # (cluster, codes) row EXACTLY — pins the append mapper as a true
    # twin of ivf_index assignment + _encode_residual
    from lambda_sample_spark.operators.pq import ivfpq_append_index

    emb, pts, exact, queries = clustered
    path = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, path, n=3000)
    dup = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "vec"
    )
    ivfpq_append_index(dup, path)
    cells = spark.read.parquet(f"{path}/cells")
    a = {
        r.vec_id: (r.cluster, tuple(r.codes))
        for r in cells.where(F.col("vec_id") < 50).collect()
    }
    b = {
        r.vec_id - 1_000_000: (r.cluster, tuple(r.codes))
        for r in cells.where(F.col("vec_id") >= 1_000_000).collect()
    }
    assert a == b and len(a) == 50


def test_append_extends_probe_results(spark, clustered, tmp_path):
    # vectors appended after the build are retrievable: an appended
    # copy of a query vector must surface in that query's top-k, and
    # recall on the original corpus must not degrade
    from lambda_sample_spark.operators.pq import ivfpq_append_index

    emb, pts, exact, queries = clustered
    path = str(tmp_path / "ivfpq")
    ivfpq_write_index(emb, path, n=3000)
    clones = spark.createDataFrame(
        [(2_000_000 + q, v) for q, v in queries],
        "vec_id BIGINT, vec ARRAY<DOUBLE>",
    )
    ivfpq_append_index(clones, path)
    got = ivfpq_probe_index(spark, path, queries).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    for q, _ in queries:
        ids = {r.c_id for r in by_q[q]}
        assert 2_000_000 + q in ids, f"appended clone missing for q={q}"
        # clone of the query is an exact match: rank 1, cosine ~ 1
        top = min(by_q[q], key=lambda r: r.rank)
        assert top.c_id == 2_000_000 + q and top.cos_sim > 0.999


def test_adc_lane_matches_relational_row(spark, sf_dir):
    # the numpy fast lane and the oracle-checked relational row must
    # agree when fed the SAME deterministic codebook (the first 32
    # corpus vectors' subvectors): identical top-k sets per query,
    # scores equal within float-vs-decimal summation tolerance
    import numpy as np

    from lambda_sample_spark.operators.common import embeddings
    from lambda_sample_spark.functions.vectors import as_double
    from pyspark.sql import functions as F

    emb = embeddings(spark, sf_dir).select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    rows = {r["vec_id"]: np.asarray(r["vec"]) for r in emb.collect()}
    books = np.stack(
        [
            np.stack([rows[c][i * 8 : (i + 1) * 8] for c in range(32)])
            for i in range(8)
        ]
    )
    encoded = pq_encode(emb, books)
    queries = [(i, rows[i].tolist()) for i in range(5)]
    fast = pq_adc_topk(encoded, queries, books).collect()
    slow = q_pq_adc_topk(spark, sf_dir).collect()
    fast_sets = {}
    for r in fast:
        fast_sets.setdefault(r.q_id, set()).add(r.c_id)
    slow_sets = {}
    slow_scores = {}
    for r in slow:
        slow_sets.setdefault(r.q_id, set()).add(r.c_id)
        slow_scores[(r.q_id, r.c_id)] = r.adc_score
    assert fast_sets == slow_sets
    for r in fast:
        assert abs(r.adc_score - slow_scores[(r.q_id, r.c_id)]) < 1e-9


def test_encode_deterministic_and_in_domain(spark, clustered):
    emb, *_ = clustered
    books = pq_train(emb, m=8, ks=64)
    a = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    b = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    assert a == b
    ks = books.shape[1]
    assert all(len(c) == 8 and all(0 <= x < ks for x in c) for c in a.values())


def test_compression_arithmetic():
    # the reason PQ exists: M codes of <=256 entries are M bytes;
    # 64-dim float64 is 512 bytes — 64x. (Codes travel as ARRAY<INT>
    # in the contract schema; the byte packing is the storage story.)
    m, dim = 8, 64
    assert dim * 8 / m == 64.0


def test_train_small_sample_clamps_ks(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0, -1.0]) for i in range(5)],
        "vec_id BIGINT, vec ARRAY<DOUBLE>",
    )
    books = pq_train(emb, m=2, ks=256)
    assert books.shape == (2, 5, 2)  # ks clamped to the 5-row sample


def test_contract_row_matches_oracle(spark, sf_dir):
    con = duckdb_con(sf_dir)
    try:
        want = con.execute(ORACLE["q_pq_adc_topk"]).fetchdf()
    finally:
        con.close()
    got = q_pq_adc_topk(spark, sf_dir)
    assert compare("q_pq_adc_topk", got, want) == []
