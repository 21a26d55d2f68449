"""Salting correctness: salted formulations must return exactly the
un-salted results while spreading hot keys over SALT_N reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.operators.skew import SALT_N, salted_agg, salted_join


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
