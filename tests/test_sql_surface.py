"""SQL surface: spark.sql over the registered views reaches the same
results (and comparable plans) as the DataFrame operators."""

from __future__ import annotations

from lambda_sample_spark.operators.anomaly import fast_anomaly
from lambda_sample_spark.sql import fast_anomaly_sql, register_views, run
from lambda_sample_spark.plans.audit import simple_plan


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        (tuple(str(r[c]) for c in cols) for r in df.collect())
    )


def test_flagship_sql_equals_dataframe(spark, sf_dir):
    sql_df = fast_anomaly_sql(spark, sf_dir)
    api_df = fast_anomaly(spark, sf_dir)
    assert sorted(sql_df.columns) == sorted(api_df.columns)
    assert _sorted_rows(sql_df) == _sorted_rows(api_df)


def test_all_tables_registered_and_queryable(spark, sf_dir):
    register_views(spark, sf_dir)
    counts = run(
        spark,
        sf_dir,
        """
        SELECT (SELECT count(*) FROM events)    AS n_events,
               (SELECT count(*) FROM lineitem)  AS n_lineitem,
               (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM embeddings) AS n_vecs,
               (SELECT count(*) FROM region)     AS n_regions
        """,
    ).first()
    assert counts.n_events > 0
    assert counts.n_lineitem > 0
    assert counts.n_docs > 0
    assert counts.n_vecs > 0
    assert counts.n_regions == 5


def test_sql_join_pushdown_still_applies(spark, sf_dir):
    # Catalyst treats SQL text and DataFrame calls identically: the
    # filter on a view reaches the parquet scan either way
    df = run(
        spark,
        sf_dir,
        "SELECT l_orderkey FROM lineitem WHERE l_quantity < 5",
    )
    plan = simple_plan(df)
    assert "PushedFilters" in plan or "l_quantity" in plan
