"""Market-basket co-occurrence: crafted-basket semantics (pair
expansion, duplicate-line dedup, lift values) + contract row vs its
DuckDB oracle."""

from __future__ import annotations

from lambda_sample_spark.operators.market import (
    ORACLE,
    cooccurrence_lift,
    q_cooccur_lift,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def test_pairs_lift_on_crafted_baskets(spark):
    # baskets: {a,b}, {a,b}, {a,c}, {b} and a duplicate (4, a) line
    # that must NOT double-count (basket membership is a set)
    items = spark.createDataFrame(
        [
            (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "b"),
            (3, "a"),  # duplicate line
        ],
        "bk BIGINT, item STRING",
    )
    rows = {
        (r["item_a"], r["item_b"]): r
        for r in cooccurrence_lift(items, "bk", "item").collect()
    }
    assert set(rows) == {("a", "b"), ("a", "c")}
    ab = rows[("a", "b")]
    # n_a=3, n_b=3, n_ab=2, N=4 -> support .5, lift 2*4/(3*3)
    assert ab["n_ab"] == 2 and ab["support"] == 0.5
    assert abs(ab["lift"] - 8.0 / 9) < 1e-6
    ac = rows[("a", "c")]
    # n_c=1 -> lift 1*4/(3*1)
    assert ac["n_ab"] == 1 and abs(ac["lift"] - 4.0 / 3) < 1e-6


def test_singleton_baskets_emit_no_pairs(spark):
    items = spark.createDataFrame(
        [(1, "a"), (2, "b")], "bk BIGINT, item STRING"
    )
    assert cooccurrence_lift(items, "bk", "item").count() == 0


def test_contract_row_matches_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_cooccur_lift(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_cooccur_lift"]).fetchdf()
    assert compare("q_cooccur_lift", got, want) == []
