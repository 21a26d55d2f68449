"""Hierarchical (continuous-aggregate) rollup and approx-quantile
switch (operators/multidim.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.operators.common import events
from lambda_sample_spark.operators.multidim import (
    hierarchical_rollup,
    quantiles_approx,
)


def _direct(ev, unit):
    return (
        ev.groupBy(F.date_trunc(unit, "ts").alias("bucket"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def test_derived_levels_equal_direct_aggregation(spark, sf_dir):
    ev = events(spark, sf_dir)
    levels = hierarchical_rollup(ev)
    for unit in ("day", "month"):
        derived = levels[unit].select(
            "bucket", "event_type", "n",
            F.round("sum_value", 6).alias("sum_value"),
            "min_value", "max_value",
        )
        direct = _direct(ev, unit).select(
            "bucket", "event_type", "n",
            F.round("sum_value", 6).alias("sum_value"),
            "min_value", "max_value",
        )
        assert derived.count() == direct.count()
        assert derived.exceptAll(direct).count() == 0, unit
        assert direct.exceptAll(derived).count() == 0, unit
    # the hierarchy actually coarsens
    assert levels["hour"].count() > levels["day"].count() > levels["month"].count()


def test_approx_quantiles_within_rank_error(spark, sf_dir):
    ev = events(spark, sf_dir)
    approx = {
        r.event_type: (r.q1, r.median, r.q3)
        for r in quantiles_approx(ev, accuracy=10000).collect()
    }
    exact = {
        r.event_type: tuple(r.q)
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25D, 0.5D, 0.75D))").alias("q"))
        .collect()
    }
    # percentile_approx returns true data values at most 1/accuracy
    # rank away; on this distribution that lands within a tight value
    # band of the interpolated exact quantile
    for et, (a1, a2, a3) in approx.items():
        e1, e2, e3 = exact[et]
        spread = max(abs(e3 - e1), 1.0)
        assert abs(a1 - e1) <= 0.05 * spread
        assert abs(a2 - e2) <= 0.05 * spread
        assert abs(a3 - e3) <= 0.05 * spread


def test_unpivot_inverts_pivot(spark, sf_dir):
    from lambda_sample_spark.operators.common import EVENT_TYPES
    from lambda_sample_spark.operators.multidim import pivot_types, unpivot_types

    wide = pivot_types(spark, sf_dir)
    long = unpivot_types(wide, [f"n_{t}" for t in EVENT_TYPES])
    # pivot(long) == wide again: compare against a direct group count
    direct = (
        events(spark, sf_dir)
        .withColumn("user_bucket", (F.col("user_id") % 10).cast("bigint"))
        .groupBy("user_bucket", "event_type")
        .agg(F.count("*").alias("n"))
    )
    nonzero = long.where(F.col("n") > 0)
    assert nonzero.exceptAll(direct).count() == 0
    assert direct.exceptAll(nonzero).count() == 0


def test_hll_sketch_rollup_merges_consistently(spark, sf_dir):
    # COUNT(DISTINCT) is not algebraic: daily distincts don't add to
    # monthly. The sketch rollup must (a) estimate each level within
    # HLL error of the exact count computed from raw, and (b) beat the
    # naive sum-of-daily-counts by construction wherever users repeat
    # across days.
    from lambda_sample_spark.operators.common import events
    from lambda_sample_spark.operators.multidim import hll_sketch_rollup

    ev = events(spark, sf_dir)
    levels = hll_sketch_rollup(ev)

    exact_day = {
        (r.day, r.event_type): r.n
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in levels["day"].collect():
        n = exact_day[(r.day, r.event_type)]
        assert abs(r.n_users - n) <= max(0.05 * n, 1), (r, n)

    exact_month = {
        (r.month, r.event_type): r.n
        for r in ev.groupBy(
            F.date_trunc("month", "ts").alias("month"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    naive = {}
    for (d, et), n in exact_day.items():
        naive[et] = naive.get(et, 0) + n
    for r in levels["month"].collect():
        n = exact_month[(r.month, r.event_type)]
        assert abs(r.n_users - n) <= max(0.05 * n, 1), (r, n)
        # the merged estimate must not degenerate to the naive sum
        # (users repeat across days in this corpus: sum >> true)
        assert naive[r.event_type] > 2 * n  # corpus property
        assert r.n_users < 0.5 * naive[r.event_type]


def test_cms_merge_equals_direct_build(spark, sf_dir):
    # CMS cells are counters, so the per-source sketches merged
    # cell-wise must be IDENTICAL to a sketch built from the global
    # token counts in one pass — the property that makes the rollup
    # (per-source/per-day -> global) free of raw rescans.
    from lambda_sample_spark.operators.common import documents
    from lambda_sample_spark.operators.multidim import (
        cms_cells,
        cms_merge,
    )

    docs = documents(spark, sf_dir)
    toks = docs.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok")
    )
    per_source = toks.groupBy("source", "tok").agg(F.count("*").alias("cnt"))
    merged = cms_merge(cms_cells(per_source, "tok", "cnt", ["source"]))
    totals = per_source.groupBy("tok").agg(F.sum("cnt").alias("cnt"))
    direct = cms_cells(totals, "tok", "cnt", [])
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_cms_never_undercounts_and_overcount_is_bounded(spark, sf_dir):
    # Estimate EVERY token (not just the contract top-20): min-of-d
    # cells can only overcount (collisions add), and the classic bound
    # overcount <= e/w * N holds with failure prob ~e^-d per query —
    # deterministic here (md5 buckets), so we pin it outright at the
    # 99th percentile and require the worst case stays under 3x that.
    import math

    from lambda_sample_spark.operators.common import documents
    from lambda_sample_spark.operators.multidim import (
        CMS_W,
        cms_cells,
        cms_estimate,
        cms_merge,
    )

    docs = documents(spark, sf_dir)
    toks = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    totals = toks.groupBy("tok").agg(F.count("*").alias("n_exact"))
    cells = cms_merge(cms_cells(totals, "tok", "n_exact", []))
    est = cms_estimate(cells, totals, "tok")
    rows = est.select("tok", "n_exact", "n_est").collect()
    n_total = sum(r.n_exact for r in rows)
    eps_bound = math.e / CMS_W * n_total
    overcounts = sorted(r.n_est - r.n_exact for r in rows)
    assert overcounts[0] >= 0  # never undercounts
    p99 = overcounts[int(0.99 * (len(overcounts) - 1))]
    assert p99 <= eps_bound, (p99, eps_bound)
    assert overcounts[-1] <= 3 * eps_bound, (overcounts[-1], eps_bound)


def test_cms_absent_key_estimates_zero(spark, sf_dir):
    # A key the corpus never saw hits d cells that are either empty
    # (no row in the cell frame -> counts as 0) or collided; min-of-d
    # must be 0 whenever ANY of its cells is empty — the sketch can
    # prove absence. An inner probe join would silently drop empty
    # cells and inflate (or vanish) absent keys.
    from lambda_sample_spark.operators.multidim import (
        cms_cells,
        cms_estimate,
        cms_merge,
    )

    totals = spark.createDataFrame(
        [("alpha", 3), ("beta", 2)], "tok string, cnt long"
    )
    cells = cms_merge(cms_cells(totals, "tok", "cnt", []))
    probes = spark.createDataFrame(
        [("alpha", 3), ("never-seen-key-xyz", 0)], "tok string, n_exact long"
    )
    got = {r.tok: r.n_est for r in cms_estimate(cells, probes, "tok").collect()}
    assert got["alpha"] == 3
    assert got["never-seen-key-xyz"] == 0, got


def test_bottomk_merge_is_subset_of_union_and_uniform(spark, sf_dir):
    # The mergeability invariant: the month sample re-ranked from day
    # samples must equal the bottom-k computed directly from raw
    # events — the k smallest hashes of the union are guaranteed to be
    # among the union of per-part k smallest.
    from lambda_sample_spark.operators.common import events
    from lambda_sample_spark.operators.multidim import (
        _bottomk,
        bottomk_day_samples,
        bottomk_merge,
    )

    ev = events(spark, sf_dir)
    day_s = bottomk_day_samples(ev)
    merged = bottomk_merge(day_s, "month").select(
        "bucket", "event_type", "event_id"
    )
    direct = _bottomk(ev, F.date_trunc("month", "ts")).select(
        "bucket", "event_type", "event_id"
    )
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # sample sizes: min(K, group size)
    from lambda_sample_spark.operators.multidim import BOTTOMK_K

    sizes = day_s.groupBy("bucket", "event_type").count()
    totals = ev.groupBy(
        F.date_trunc("day", "ts").alias("bucket"), "event_type"
    ).count().withColumnRenamed("count", "n")
    joined = sizes.join(totals, ["bucket", "event_type"])
    assert (
        joined.where(
            F.col("count") != F.least(F.lit(BOTTOMK_K), F.col("n"))
        ).count()
        == 0
    )


def test_sample_median_all_null_group_yields_null(spark):
    # round-7 advice: a group whose sample has zero non-null values
    # made idx=0 and element_at(arr, 0) raise; it must yield NULL
    # (matching DuckDB's 1-based list[0]) instead of crashing
    from lambda_sample_spark.operators.multidim import _sample_median

    grouped = spark.createDataFrame(
        [
            ("2024-01-01", "a", None),
            ("2024-01-01", "a", None),
            ("2024-01-01", "b", 2.0),
            ("2024-01-01", "b", 5.0),
        ],
        "bucket STRING, event_type STRING, value DOUBLE",
    )
    rows = {r.event_type: r for r in _sample_median(grouped).collect()}
    assert rows["a"].q50_est is None and rows["a"].sample_n == 0
    assert rows["b"].q50_est == 2.0 and rows["b"].sample_n == 2
