"""Bin-bucketed interval join: boundary/overlap semantics on crafted
intervals + the contract row vs its DuckDB EXISTS oracle."""

from __future__ import annotations

from lambda_sample_spark.operators.rangejoin import (
    ORACLE,
    interval_semi_join,
    q_interval_flag,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def test_boundaries_overlap_and_multibin(spark):
    # one interval spanning two 300s bins, plus an overlapping twin —
    # a probe row inside BOTH must come back exactly once (semi join)
    iv = spark.createDataFrame(
        [(100_000, 400_000), (150_000, 350_000)], "s BIGINT, e BIGINT"
    )
    probe = spark.createDataFrame(
        [
            (1, 99_999),   # just before start -> out
            (2, 100_000),  # inclusive start -> in
            (3, 200_000),  # inside both intervals -> in, once
            (4, 350_000),  # second bin of the long interval -> in
            (5, 400_000),  # inclusive end -> in
            (6, 400_001),  # just after end -> out
        ],
        "id BIGINT, t BIGINT",
    )
    got = sorted(
        r["id"]
        for r in interval_semi_join(probe, iv, "t", "s", "e").collect()
    )
    assert got == [2, 3, 4, 5]


def test_empty_intervals(spark):
    iv = spark.createDataFrame([], "s BIGINT, e BIGINT")
    probe = spark.createDataFrame([(1, 0)], "id BIGINT, t BIGINT")
    assert interval_semi_join(probe, iv, "t", "s", "e").count() == 0


def test_contract_vs_oracle(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    sdf = q_interval_flag(spark, SMOKE_SF_DIR)
    odf = con.execute(ORACLE["q_interval_flag"]).fetchdf()
    assert compare("q_interval_flag", sdf, odf) == []
