"""Column profiling: crafted nulls/duplicates fixture + the contract
row vs its DuckDB oracle + single-scan plan shape."""

from __future__ import annotations

from lambda_sample_spark.operators.profiling import (
    ORACLE,
    profile,
    q_data_profile,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def test_profile_metrics_on_crafted_fixture(spark):
    df = spark.createDataFrame(
        [
            (1.0, "a"),
            (2.0, "a"),
            (2.0, None),
            (None, "b"),
        ],
        "x DOUBLE, s STRING",
    )
    rows = {r["column"]: r for r in profile(df, ("x",), ("s",)).collect()}
    x, s = rows["x"], rows["s"]
    assert x["n_rows"] == 4 and x["n_null"] == 1 and x["n_distinct"] == 2
    assert x["completeness"] == 0.75
    assert abs(x["mean"] - 5.0 / 3) < 1e-6
    assert x["min_num"] == 1.0 and x["max_num"] == 2.0
    assert x["min_str"] is None and x["max_str"] is None
    assert s["n_null"] == 1 and s["n_distinct"] == 2
    assert s["min_str"] == "a" and s["max_str"] == "b"
    assert s["mean"] is None and s["min_num"] is None


def test_profile_single_corpus_scan(spark):
    # the unpivot must not duplicate the aggregate subtree per column
    spark.catalog.clearCache()
    df = q_data_profile(spark, SMOKE_SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_contract_row_matches_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_data_profile(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_data_profile"]).fetchdf()
    assert compare("q_data_profile", got, want) == []
