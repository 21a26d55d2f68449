"""connected_components: correctness vs a pure-Python union-find on
seeded random graphs, log-round convergence on a long chain, node
universe / isolated-node semantics, and the contract row's oracle."""

from __future__ import annotations

import random

import pytest

from lambda_sample_spark.operators.graph import (
    cc_ingest,
    connected_components,
    q_connected_components,
)
from tests.oracle_harness import compare, duckdb_con


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in component
    comp_min: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_union_find_on_random_graph(spark, seed):
    rng = random.Random(seed)
    n, m = 80, 70  # sparse: several components of varied shapes
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    want = _union_find(n, edges)
    edf = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    ndf = spark.createDataFrame([(i,) for i in range(n)], "node BIGINT")
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == want


def test_chain_converges_in_log_rounds(spark):
    # a 200-node path is the adversarial diameter case for plain
    # 1-hop propagation (200 rounds); pointer jumping must finish
    # within ~log2 rounds — max_rounds=10 both proves convergence
    # speed and the correctness of the result
    n = 200
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src BIGINT, dst BIGINT"
    )
    got = connected_components(edf, max_rounds=10).collect()
    assert len(got) == n
    assert all(r["comp"] == 0 for r in got)


def test_isolated_nodes_and_null_edges(spark):
    edf = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None)], "src BIGINT, dst BIGINT"
    )
    ndf = spark.createDataFrame([(i,) for i in range(1, 8)], "node BIGINT")
    got = {r["node"]: r["comp"] for r in connected_components(edf, nodes=ndf).collect()}
    # NULL-endpoint edges dropped: 3 and 4 stay isolated
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5, 6: 6, 7: 7}


def test_endpoints_outside_explicit_universe_still_connect(spark):
    # a nodes frame omitting a through-node must not sever the path:
    # endpoints always join the universe
    edf = spark.createDataFrame([(1, 99), (99, 2)], "src BIGINT, dst BIGINT")
    ndf = spark.createDataFrame([(1,), (2,)], "node BIGINT")
    got = {r["node"]: r["comp"] for r in connected_components(edf, nodes=ndf).collect()}
    assert got == {1: 1, 2: 1, 99: 1}


def test_nonconvergence_raises(spark):
    edf = spark.createDataFrame([(i, i + 1) for i in range(63)], "src BIGINT, dst BIGINT")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, max_rounds=1)


@pytest.mark.parametrize("seed", [0, 4])
def test_incremental_ingest_matches_full_recompute(spark, seed):
    # cc(all edges) == cc_ingest(cc(first half), second half): the
    # star-edge reduction preserves connectivity exactly, including
    # components that only merge ACROSS the two batches and new nodes
    # that appear only in the second batch
    rng = random.Random(seed)
    n, m = 60, 50
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    ndf = spark.createDataFrame([(i,) for i in range(n)], "node BIGINT")
    full = {
        r["node"]: r["comp"]
        for r in connected_components(
            spark.createDataFrame(edges, "src BIGINT, dst BIGINT"), nodes=ndf
        ).collect()
    }
    half = m // 2
    first = connected_components(
        spark.createDataFrame(edges[:half], "src BIGINT, dst BIGINT"), nodes=ndf
    )
    merged = {
        r["node"]: r["comp"]
        for r in cc_ingest(
            first, spark.createDataFrame(edges[half:], "src BIGINT, dst BIGINT")
        ).collect()
    }
    assert merged == full


def test_contract_row_matches_oracle(spark, sf_dir):
    from lambda_sample_spark.operators.graph import ORACLE

    con = duckdb_con(sf_dir)
    try:
        want = con.execute(ORACLE["q_connected_components"]).fetchdf()
    finally:
        con.close()
    got = q_connected_components(spark, sf_dir)
    assert compare("q_connected_components", got, want) == []
