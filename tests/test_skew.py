"""Salting correctness: salted formulations must return exactly the
un-salted results while spreading hot keys over SALT_N reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators.skew import SALT_N, salted_agg, salted_join
from lambda_sample_spark.plans.audit import simple_plan


def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: (r.n, r.total, r.avg_value)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .collect()
    }
    salted = {
        r.event_type: (r.n, r.total, r.avg_value)
        for r in salted_agg(ev, "event_type", "value", ["event_id"]).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    lvl1 = (
        ev.withColumn(
            "_salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_N)).cast("int")
        )
        .groupBy("event_type", "_salt")
        .count()
    )
    per_key = lvl1.groupBy("event_type").count().collect()
    # every key fans out over (almost) all salt buckets
    assert all(r["count"] >= SALT_N - 1 for r in per_key)


def test_salted_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")  # skewed fact (event_type)
    dim = (
        ev.groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("type_avg"))
    )
    plain = (
        ev.join(dim, "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("type_avg"), 2).alias("s"))
        .collect()[0]
    )
    salted = (
        salted_join(ev, dim, "event_type", ["event_id"])
        .agg(F.count("*").alias("n"), F.round(F.sum("type_avg"), 2).alias("s"))
        .collect()[0]
    )
    assert (salted.n, salted.s) == (plain.n, plain.s)


def test_aqe_skew_join_split_fires(spark):
    """Prove the claimed runtime mitigation: with AQE skew-join
    thresholds sized for test data, a pathologically skewed shuffle
    join's final adaptive plan marks the sort-merge join skew=true
    (the hot partition was split)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one key owns ~95% of 200k fact rows; right side is uniform
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
            .cast("long").alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").cast("double").alias("w")
        )
        # aggregate ON TOP of the join and collect THAT frame: the
        # collect drives this DataFrame's own query execution, whose
        # final adaptive plan contains the (possibly split) join.
        # Global agg (no keys): imposes no distribution requirement, so
        # OptimizeSkewedJoin is free to split; sum(length(payload))
        # keeps the fat column in the shuffle (a keyed agg on the join
        # key would forbid the split, and count(*) would let pruning
        # shrink the shuffle below the skew threshold).
        out = fact.join(dim, "k").agg(
            F.sum(F.length("payload")).alias("bytes")
        )
        assert out.collect()[0]["bytes"] > 0  # collect drives THIS df's QE
        plan = simple_plan(out)
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_heavy_hitters_detects_hot_key(spark):
    import pyspark.sql.functions as F

    from lambda_sample_spark.operators.skew import heavy_hitters

    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold-"), F.col("id")))
        .alias("k")
    )
    hh = heavy_hitters(df, "k", min_share=0.05).collect()
    assert [r.k for r in hh] == ["hot"]
    assert abs(hh[0].share - 0.9) < 0.01
    # output is bounded: nothing under the share floor leaks through
    all_rows = heavy_hitters(df, "k", min_share=0.00005).count()
    assert all_rows == 1 + 1000  # hot + every cold key
