"""Spark-Connect capability shim (plans/shim.py): the public-API
fallback path must produce the same plan text the JVM fast path does
(on classic they are the same explainString call), and the contract
operators that use JVM internals (graph's checkpoint release) must
stay correct when the fast path is unavailable."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lambda_sample_spark.plans import shim
from lambda_sample_spark.plans.audit import (
    codegen_span_count,
    normalized_plan,
    pushed_filters,
    simple_plan,
)


@pytest.fixture
def fallback():
    shim.FORCE_FALLBACK = True
    try:
        yield
    finally:
        shim.FORCE_FALLBACK = False


def _frame(spark, sf_dir):
    from lambda_sample_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 10)
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )


def test_fallback_plan_text_matches_fast_path(spark, sf_dir):
    df = _frame(spark, sf_dir)
    fast_phys = shim.physical_plan(df)
    fast_opt = shim.optimized_plan(df)
    fast_fmt = shim.explain_string(df, "formatted")
    try:
        shim.FORCE_FALLBACK = True
        slow_phys = shim.physical_plan(df)
        slow_opt = shim.optimized_plan(df)
        slow_fmt = shim.explain_string(df, "formatted")
    finally:
        shim.FORCE_FALLBACK = False
    # optimized + formatted agree byte-for-byte (same explainString);
    # the physical fast path is the VERBOSE treeString while explain
    # 'simple' is the simpleString, so compare its strategy skeleton
    # (normalized_plan — the form every plan pin in the suite greps)
    assert slow_opt.strip() == fast_opt.strip()
    assert fast_fmt.strip() == slow_fmt.strip()
    import re

    def skel(plan: str) -> list[str]:
        return [
            re.split(r"[\s(]", line.strip(" +-:*)("), 1)[0]
            for line in plan.splitlines()
            if line.strip(" +-:*)(")
        ]

    assert skel(slow_phys) == skel(fast_phys)
    for tok in ("Exchange hashpartitioning", "HashAggregate", "FileScan"):
        assert (tok in slow_phys) == (tok in fast_phys)


def test_audit_helpers_work_through_fallback(spark, sf_dir, fallback):
    df = _frame(spark, sf_dir)
    # the audit surface stays functional: pushdown visible, codegen
    # countable, the normalized skeleton identical to the fast path
    assert any("l_quantity" in p for p in pushed_filters(df))
    assert codegen_span_count(df) >= 1
    norm = normalized_plan(df)
    assert "Exchange" in norm and "FileScan parquet" in norm
    assert "BroadcastHashJoin" in simple_plan(df) or "SortMergeJoin" in simple_plan(df)


def test_normalized_plan_identical_across_paths(spark, sf_dir):
    df = _frame(spark, sf_dir)
    fast = normalized_plan(df)
    try:
        shim.FORCE_FALLBACK = True
        slow = normalized_plan(df)
    finally:
        shim.FORCE_FALLBACK = False
    assert fast == slow


def test_release_checkpoint_fallback_is_safe(spark, fallback):
    from lambda_sample_spark.operators.graph import unpersist_checkpoint

    df = spark.range(100).localCheckpoint(eager=True)
    assert shim.release_checkpoint(df) is False  # no eager path
    unpersist_checkpoint(df)  # falls back to plain unpersist, no raise
    assert df.count() == 100  # plain unpersist keeps the frame usable


def test_connected_components_green_through_fallback(spark, fallback):
    # the contract consumer of release_checkpoint: CC must stay
    # CORRECT when the eager release degrades to best-effort
    from lambda_sample_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src BIGINT, dst BIGINT"
    )
    got = {
        (r.node, r.comp)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)}
