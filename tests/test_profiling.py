"""Column profiling: crafted nulls/duplicates fixture + the contract
row vs its DuckDB oracle + single-scan plan shape."""

from __future__ import annotations

from lambda_sample_spark.plans.audit import simple_plan
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
    plan = simple_plan(df)
    assert plan.count("Scan parquet") == 1


def test_contract_row_matches_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_data_profile(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_data_profile"]).fetchdf()
    assert compare("q_data_profile", got, want) == []


def test_check_constraints_semantics(spark):
    from lambda_sample_spark.operators.profiling import (
        check_constraints,
        profile,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "b"), (4, 40.0, None)],
        "id long, x double, s string",
    )
    prof = profile(df, ("x",), ("s",))
    out = {
        r["check"]: r
        for r in check_constraints(
            prof,
            [
                ("x_complete", "x", "completeness", "ge", 1.0),
                ("x_min", "x", "min_num", "ge", 0.0),
                ("s_card", "s", "n_distinct", "eq", 2.0),
                ("x_mean_le", "x", "mean", "le", 25.0),
            ],
        ).collect()
    }
    assert out["x_complete"]["passed"] == 0  # one null of four
    assert out["x_min"]["passed"] == 1
    assert out["s_card"]["passed"] == 1
    assert out["x_mean_le"]["passed"] == 1  # mean(10,20,40)=23.33
    assert out["x_mean_le"]["value"] == 23.333333

    import pytest as _p

    with _p.raises(ValueError, match="unsupported"):
        check_constraints(prof, [("bad", "x", "nope", "ge", 1.0)])
    with _p.raises(ValueError, match="unsupported"):
        check_constraints(prof, [("bad", "x", "mean", "between", 1.0)])
