"""HTML/boilerplate extraction (operators/html_extract.py): planted
fixtures for every rule (tag boilerplate, link farms, short blocks,
stopword floor), ordered reassembly, the zero-shuffle block plan, and
the contract row vs DuckDB cell-exactly."""

from __future__ import annotations

import pytest

from lambda_sample_spark.operators.html_extract import (
    MIN_WORDS,
    ORACLE_SQL,
    extract_text,
    html_blocks,
    q_html_extract,
    synthesize_html,
)
from lambda_sample_spark.plans.audit import simple_plan
from tests.conftest import SMOKE_SF_DIR
from tests.oracle_harness import compare, duckdb_con

GOOD_P = "<p>the table scan was a slow one but the sort kept the rows</p>"
GOOD_P2 = "<p>a merge join beats the hash join when the rows arrive sorted</p>"
NAV = '<nav><a href="/">Home</a> <a href="/faq">FAQ</a></nav>'
FOOTER = "<footer>(c) somebody, all the rights reserved</footer>"
LINK_FARM = (
    '<p>see <a href="/1">the best offer here</a> or '
    '<a href="/2">an even better offer there</a> ok</p>'
)
SHORT = "<p>a tiny one</p>"
NO_STOPS = "<p>colorless green ideas sleep furiously tonight forever again</p>"
H1 = "<h1>the very long and wordy title of a page</h1>"


@pytest.fixture(scope="module")
def pages(spark):
    html = H1 + NAV + GOOD_P + LINK_FARM + SHORT + NO_STOPS + GOOD_P2 + FOOTER
    return spark.createDataFrame(
        [(1, html), (2, "no tags at all"), (3, "")],
        "doc_id LONG, html STRING",
    )


def test_rules_keep_content_drop_boilerplate(pages):
    rows = {
        (r.doc_id, r.i): r
        for r in html_blocks(pages).collect()
    }
    by_text = {r.text: r for r in rows.values() if r.doc_id == 1}
    # real paragraphs survive
    assert by_text["the table scan was a slow one but the sort kept the rows"].keep
    assert by_text["a merge join beats the hash join when the rows arrive sorted"].keep
    # tag boilerplate: nav / h1 / footer are never candidates — even
    # the wordy h1 with plenty of stopwords
    assert not by_text["Home FAQ"].keep
    assert not by_text["the very long and wordy title of a page"].keep
    assert not by_text["(c) somebody, all the rights reserved"].keep
    # link farm: anchors dominate the text -> dropped by density
    farm = by_text["see the best offer here or an even better offer there ok"]
    assert farm.link_chars > 0 and not farm.keep
    # short block dropped by the word floor
    assert by_text["a tiny one"].n_words < MIN_WORDS
    assert not by_text["a tiny one"].keep
    # stopword floor: fluent-looking but function-word-free -> dropped
    ns = by_text["colorless green ideas sleep furiously tonight forever again"]
    assert ns.n_stop == 0 and not ns.keep
    # tagless / empty docs produce zero blocks
    assert not [r for r in rows.values() if r.doc_id in (2, 3)]


def test_reassembly_orders_kept_blocks(pages):
    out = {r.doc_id: r for r in extract_text(html_blocks(pages)).collect()}
    assert out[1].n_blocks == 8 and out[1].n_kept == 2
    assert out[1].content == (
        "the table scan was a slow one but the sort kept the rows "
        "a merge join beats the hash join when the rows arrive sorted"
    )
    # docs 2/3 have no blocks at all, so no output group (extract
    # consumes the block stream; presence-of-doc is the caller's join)
    assert set(out) == {1}


def test_block_scoring_is_shuffle_free(pages):
    plan = simple_plan(html_blocks(pages))
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange rangepartitioning") == 0
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_synthesized_pages_cover_every_block_class(spark):
    pages = synthesize_html(spark, SMOKE_SF_DIR)
    one = pages.limit(1).collect()[0]
    for tag in ("<h1>", "<nav>", "<p>", "<footer>", '<a href="/r">'):
        assert tag in one.html


def test_contract_row_vs_oracle(spark):
    df = q_html_extract(spark, SMOKE_SF_DIR)
    want = duckdb_con(SMOKE_SF_DIR).execute(ORACLE_SQL).fetchdf()
    assert compare("q_html_extract", df, want) == []
    # the row is informative at this SF: both keeps and drops occur
    got = df.toPandas()
    assert (got["n_kept"] > 0).any() and (got["n_kept"] == 0).any()
