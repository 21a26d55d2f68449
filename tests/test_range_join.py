"""Binned range join: exact equivalence with the naive inequality
join, and an equi-join-only physical plan (no nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators.joins_ext import range_join_binned
from lambda_sample_spark.plans import audit

TOL_MS = 30 * 60 * 1000  # 30 minutes


def _sides(spark, sf_dir):
    # self-range-join of the events stream: same-user event pairs
    # within the tolerance (orders and events don't overlap in time in
    # the fixture, so the self-join is the non-trivial case)
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(F.col("user_id").alias("k"), F.col("ts").alias("o_ts"),
                  F.col("event_id").alias("o_orderkey"))
    b = ev.select(F.col("user_id").alias("k"), F.col("ts").alias("ev_ts"),
                  "event_id")
    return a, b


def test_binned_equals_naive(spark, sf_dir):
    orders, ev = _sides(spark, sf_dir)
    binned = range_join_binned(
        orders, ev, key="k", left_ts="o_ts", right_ts="ev_ts",
        tolerance_ms=TOL_MS,
    ).where(F.col("o_orderkey") < F.col("event_id")).select("k", "o_orderkey", "event_id")
    naive = (
        orders.join(ev, "k")
        .where(
            (F.abs(F.unix_millis("o_ts") - F.unix_millis("ev_ts")) <= TOL_MS)
            & (F.col("o_orderkey") < F.col("event_id"))
        )
        .select("k", "o_orderkey", "event_id")
    )
    assert binned.count() == naive.count()
    assert binned.exceptAll(naive).count() == 0
    assert naive.exceptAll(binned).count() == 0
    assert binned.count() > 0  # the fixture overlap is non-trivial


def test_binned_narrow_bins_still_exact(spark, sf_dir):
    # bin_ms < tolerance_ms: qualifying pairs can sit several bins
    # apart, so the replication radius must widen to ceil(tol/bin) —
    # the round-3 advice finding (previously silently dropped pairs).
    orders, ev = _sides(spark, sf_dir)
    binned = range_join_binned(
        orders, ev, key="k", left_ts="o_ts", right_ts="ev_ts",
        tolerance_ms=TOL_MS, bin_ms=TOL_MS // 3,
    ).where(F.col("o_orderkey") < F.col("event_id")).select("k", "o_orderkey", "event_id")
    naive = (
        orders.join(ev, "k")
        .where(
            (F.abs(F.unix_millis("o_ts") - F.unix_millis("ev_ts")) <= TOL_MS)
            & (F.col("o_orderkey") < F.col("event_id"))
        )
        .select("k", "o_orderkey", "event_id")
    )
    assert binned.count() == naive.count()
    assert binned.exceptAll(naive).count() == 0
    assert naive.exceptAll(binned).count() == 0


def test_binned_rejects_bad_bin(spark, sf_dir):
    import pytest

    orders, ev = _sides(spark, sf_dir)
    with pytest.raises(ValueError):
        range_join_binned(orders, ev, "k", "o_ts", "ev_ts", TOL_MS, bin_ms=0)


def test_binned_plan_is_equi_join(spark, sf_dir):
    orders, ev = _sides(spark, sf_dir)
    plan = audit.simple_plan(
        range_join_binned(orders, ev, "k", "o_ts", "ev_ts", TOL_MS)
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
