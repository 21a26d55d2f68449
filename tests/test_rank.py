"""Weighted PageRank: hand-computed fixpoint behavior on a crafted
graph + the contract row vs its unrolled-CTE DuckDB oracle."""

from __future__ import annotations

from lambda_sample_spark.operators.rank import (
    ORACLE,
    pagerank,
    q_pagerank_nations,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src STRING, dst STRING, w DOUBLE")


def test_sink_accumulates_rank(spark):
    # a -> c and b -> c: after one round c holds base + d*(r_a + r_b);
    # a and b (no in-edges) sit at the teleport floor
    out = {
        r["node"]: r["r"]
        for r in pagerank(
            _edges(spark, [("a", "c", 1.0), ("b", "c", 1.0)]), iters=1
        ).collect()
    }
    base = 0.15 / 3
    assert abs(out["a"] - base) < 1e-12 and abs(out["b"] - base) < 1e-12
    assert abs(out["c"] - (base + 0.85 * (2 / 3))) < 1e-12


def test_weights_split_proportionally(spark):
    # a splits 3:1 between b and c -> b gets 3x c's contribution
    out = {
        r["node"]: r["r"]
        for r in pagerank(
            _edges(spark, [("a", "b", 3.0), ("a", "c", 1.0)]), iters=1
        ).collect()
    }
    base = 0.15 / 3
    assert abs(out["b"] - (base + 0.85 * (1 / 3) * 0.75)) < 1e-12
    assert abs(out["c"] - (base + 0.85 * (1 / 3) * 0.25)) < 1e-12


def test_rank_mass_is_conserved_without_dangling(spark):
    # a cycle has no dangling mass: total rank stays 1.0 every round
    cyc = _edges(
        spark, [("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 5.0)]
    )
    total = sum(r["r"] for r in pagerank(cyc, iters=3).collect())
    assert abs(total - 1.0) < 1e-9


def test_contract_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    sdf = q_pagerank_nations(spark, SMOKE_SF_DIR)
    odf = con.execute(ORACLE["q_pagerank_nations"]).fetchdf()
    assert compare("q_pagerank_nations", sdf, odf) == []
