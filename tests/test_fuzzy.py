"""Fuzzy entity matching: crafted-catalog semantics (tiebreak, miss,
length-band prune soundness) + contract row vs its DuckDB oracle."""

from __future__ import annotations

from lambda_sample_spark.operators.fuzzy import (
    MAX_DIST,
    ORACLE,
    PROBES,
    fuzzy_match,
    q_entity_match,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def _match(spark, probes, catalog, **kw):
    p = spark.createDataFrame([(s,) for s in probes], "probe STRING")
    c = spark.createDataFrame([(s,) for s in catalog], "name STRING")
    return {
        r["probe"]: r for r in fuzzy_match(p, c, **kw).collect()
    }


def test_tiebreak_is_lexicographic_at_equal_distance(spark):
    got = _match(spark, ["ned bolt"], ["red bolt", "new bolt"])
    r = got["ned bolt"]
    assert r["match"] == "new bolt" and r["dist"] == 1
    assert r["n_candidates"] == 2


def test_miss_survives_as_null_row(spark):
    got = _match(spark, ["zzzzzz"], ["red bolt"])
    r = got["zzzzzz"]
    assert r["match"] is None and r["dist"] is None
    assert r["n_candidates"] == 0


def test_length_band_never_drops_a_true_match(spark):
    # candidates at every length offset in [-max_dist, +max_dist]
    # around the probe must remain reachable
    got = _match(
        spark,
        ["abcde"],
        ["abc", "abcd", "abcde", "abcdef", "abcdefg"],
        max_dist=2,
    )
    assert got["abcde"]["match"] == "abcde"
    assert got["abcde"]["n_candidates"] == 5


def test_exact_hit_wins_over_near_miss(spark):
    got = _match(spark, ["red bolt"], ["red bolt", "red bolts"])
    assert got["red bolt"]["match"] == "red bolt"
    assert got["red bolt"]["dist"] == 0


def test_contract_row_matches_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_entity_match(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_entity_match"]).fetchdf()
    assert compare("q_entity_match", got, want) == []
    # contract shape: one row per probe, always
    assert got.count() == len(PROBES)
    assert MAX_DIST == 2
