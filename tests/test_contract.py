"""Drive every contract query against its DuckDB oracle at the
correctness SF (sf0.01 — same as the driver's gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_con

QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0  # mirrors the driver contract: entry() must yield rows
    assert df.columns


def test_every_query_has_oracle_or_is_marked():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle entries without queries: {missing}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    sdf = q(spark, sf_dir)
    if name not in oracles:
        # rows-only contract: just execute and sanity-check schema
        assert sdf.columns
        sdf.limit(5).collect()
        return
    odf = con.execute(oracles[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, "\n".join(problems)
