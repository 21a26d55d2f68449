"""Pareto frontier: crafted dominance cases (ties, duplicates,
close-price sweep correctness) + contract row vs the NOT-EXISTS
DuckDB oracle."""

from __future__ import annotations

from lambda_sample_spark.operators.skyline import (
    ORACLE,
    pareto_front,
    q_pareto_front,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

SCHEMA = "g STRING, id BIGINT, price DOUBLE, size INT"


def _front(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["id"]
        for r in pareto_front(df, "g", "price", "size", "id").collect()
    }


def test_basic_dominance_and_frontier(spark):
    got = _front(
        spark,
        [
            ("a", 1, 10.0, 5),   # frontier (cheapest)
            ("a", 2, 20.0, 9),   # frontier (bigger than all cheaper)
            ("a", 3, 15.0, 4),   # dominated by 1 (pricier, smaller)
            ("a", 4, 30.0, 9),   # dominated by 2 (pricier, same size)
            ("a", 5, 40.0, 12),  # frontier
        ],
    )
    assert got == {1, 2, 5}


def test_sub_unit_price_gaps_still_sweep(spark):
    # prices 0.3 apart: a RANGE -1 frame would miss these dominators
    got = _front(
        spark,
        [("a", 1, 10.0, 5), ("a", 2, 10.3, 5), ("a", 3, 10.6, 4)],
    )
    assert got == {1}


def test_equal_price_ties_and_duplicates(spark):
    got = _front(
        spark,
        [
            ("a", 1, 10.0, 5),  # dominated by 2 (same price, bigger)
            ("a", 2, 10.0, 8),  # frontier
            ("a", 3, 10.0, 8),  # duplicate point: also survives
        ],
    )
    assert got == {2, 3}


def test_groups_are_independent(spark):
    got = _front(
        spark,
        [("a", 1, 10.0, 5), ("b", 2, 99.0, 1)],
    )
    assert got == {1, 2}


def test_contract_row_matches_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_pareto_front(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_pareto_front"]).fetchdf()
    assert compare("q_pareto_front", got, want) == []
