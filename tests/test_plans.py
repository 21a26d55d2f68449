"""Physical-plan audits (SURVEY.md §4): pushdown, pruning, broadcast,
partial aggregation, codegen — the scale-readiness checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators.aggregates import group_sum_avg, share_of_total
from lambda_sample_spark.operators.joins import lookup_join_left
from lambda_sample_spark.operators.tpch import tpch_join_agg, tpch_q6
from lambda_sample_spark.operators.windows import scan_filter_limit
from lambda_sample_spark.plans import audit


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = scan_filter_limit(spark, sf_dir)
    pushed = audit.pushed_filters(df)
    assert any("event_type" in p for p in pushed), pushed


def test_column_pruning(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey").limit(5)
    schemas = audit.read_schemas(df)
    assert schemas and all("l_extendedprice" not in s for s in schemas), schemas


def test_q6_pushes_all_predicates(spark, sf_dir):
    df = tpch_q6(spark, sf_dir)
    pushed = " ".join(audit.pushed_filters(df))
    assert "l_discount" in pushed and "l_quantity" in pushed, pushed


def test_dimension_joins_broadcast(spark, sf_dir):
    assert audit.has_broadcast_join(tpch_join_agg(spark, sf_dir))
    assert audit.has_broadcast_join(lookup_join_left(spark, sf_dir))


def test_aggregates_partial(spark, sf_dir):
    assert audit.has_partial_agg(group_sum_avg(spark, sf_dir))


def test_share_of_total_windows_only_aggregated_frame(spark, sf_dir):
    """The sum-over-() window must run over the aggregated (tiny)
    frame, after the HashAggregate — not over the raw events."""
    plan = audit.simple_plan(share_of_total(spark, sf_dir))
    assert plan.index("Window") < plan.index("HashAggregate")


def test_codegen_covers_hot_path(spark, sf_dir):
    df = group_sum_avg(spark, sf_dir)
    assert audit.codegen_span_count(df) >= 1


def test_scan_limit_is_take_ordered(spark, sf_dir):
    plan = audit.simple_plan(scan_filter_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
