"""Quality rule pack: each rule fires on a planted violation, passes
on clean prose, the contract row matches its DuckDB oracle, and the
plan is a bare scan (zero exchanges)."""

from __future__ import annotations

from lambda_sample_spark.plans.audit import simple_plan
from lambda_sample_spark.operators.text import (
    ORACLE,
    q_quality_rules,
    quality_rules,
)
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con


def test_contract_matches_oracle(spark):
    sdf = q_quality_rules(spark, SMOKE_SF_DIR)
    odf = duckdb_con(SMOKE_SF_DIR).execute(
        ORACLE["q_quality_rules"]
    ).fetchdf()
    assert compare("q_quality_rules", sdf, odf) == []


def test_each_rule_fires_on_planted_violation(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown foxes jumped over several lazy sleeping dogs"),
            (1, "too few"),  # word count floor
            (2, "a a b c d e f g h i j k l m n o p q r s t u v w"),  # short words
            (3, "the " + "spam " * 40),  # diversity floor
            (4, "pneumonoultramicroscopic silicovolcanoconiosis "
                "antidisestablishmentarianism floccinaucinihilipilification "
                "supercalifragilistic expialidocious"),  # mean word length cap
            (5, "zvqx wkjh qpml ngrt bsdf hjkl wert yuio asdg zxcv"),  # no stopwords
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in quality_rules(docs).collect()}
    assert out[0]["keep"]
    assert not out[1]["r_word_count"] and not out[1]["keep"]
    assert not out[2]["r_short_words"] and not out[2]["keep"]
    assert not out[3]["r_diversity"] and not out[3]["keep"]
    assert not out[4]["r_word_len"] and not out[4]["keep"]
    assert not out[5]["r_stopwords"] and not out[5]["keep"]
    # reasons are attributable: the clean doc fails nothing
    assert all(out[0][c] for c in out[0].asDict() if c.startswith("r_"))


def test_plan_is_bare_scan(spark):
    plan = simple_plan(q_quality_rules(spark, SMOKE_SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange rangepartitioning") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
