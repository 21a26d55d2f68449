"""BM25 retrieval: ranking semantics on a crafted corpus + the
contract row vs its DuckDB oracle + zero-shuffle plan shape."""

from __future__ import annotations

from lambda_sample_spark.plans.audit import simple_plan
from lambda_sample_spark.operators.retrieval import (
    ORACLE,
    bm25_topk,
    q_bm25_topk,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

SCHEMA = "doc_id BIGINT, text STRING"


def test_bm25_ranks_rarer_term_and_shorter_doc_higher(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),          # rare term, short doc
            (2, "join join join join join"),   # common term
            (3, "join other words here now"),
            (4, "join more filler text body"),
            (5, "nothing relevant at all"),
            (6, "spark join"),                 # both terms
        ],
        SCHEMA,
    )
    rows = bm25_topk(docs, terms=("spark", "join"), k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert 5 not in ids  # zero-score docs are excluded
    # doc 6 carries both terms incl. the rarer 'spark' -> beats the
    # join-only docs; docs 1 and 6 are the only 'spark' carriers
    assert set(ids[:2]) == {1, 6}
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["tf_spark"] == 3 and by_id[1]["tf_join"] == 0
    assert by_id[6]["tf_spark"] == 1 and by_id[6]["tf_join"] == 1


def test_bm25_k_cut_is_deterministic_by_doc_id(spark):
    # ten identical docs, k=3: the cut must keep the lowest doc_ids
    docs = spark.createDataFrame(
        [(i, "spark text") for i in range(10)], SCHEMA
    )
    rows = bm25_topk(docs, terms=("spark",), k=3).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2]


def test_contract_plan_is_single_scan_zero_exchange(spark):
    spark.catalog.clearCache()
    df = q_bm25_topk(spark, SMOKE_SF_DIR)
    plan = simple_plan(df)
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange rangepartitioning") == 0
    assert "TakeOrderedAndProject" in plan


def test_contract_row_matches_oracle_smoke(spark):
    con = duckdb_con(SMOKE_SF_DIR)
    got = q_bm25_topk(spark, SMOKE_SF_DIR)
    want = con.execute(ORACLE["q_bm25_topk"]).fetchdf()
    assert compare("q_bm25_topk", got, want) == []
