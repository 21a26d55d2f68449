"""Runtime (bloom) semi-join reduction — the engine-native pruning
path for fact⋈filtered-dim joins where the dim is too big to
broadcast. Spark injects a BloomFilterAggregate on the creation
(small/filtered) side and a might_contain filter on the application
(fact) side, so fact rows that cannot join are dropped BEFORE the
shuffle — at 100 TB this is the difference between shuffling the
whole fact table and shuffling the matching slice.

The feature is size-gated: the application side must look big enough
to be worth protecting (applicationSideScanSizeThreshold, default
10 GB) and the creation side small enough to build cheaply. Test-SF
parquet never crosses the default gate, so these tests lower it to
model the 100 TB regime and assert (a) the filter is actually
injected, (b) results are byte-identical with the feature off — the
optimization must be invisible to semantics.

Spark-first note: this is deliberately NOT hand-rolled. The
optimizer's runtime filter owns hash-function choice, sizing (NDV
estimation), and plan placement; a manual bloom join would
hand-schedule what Catalyst already does.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from lambda_sample_spark.io import load_table
from lambda_sample_spark.plans.audit import optimized_plan

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # model the 100 TB regime at test SF: any scan counts as "big"
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
}


@contextmanager
def _confs(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _shape(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 400000
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )


def test_bloom_filter_is_injected(spark, sf_dir):
    with _confs(spark, BLOOM_CONFS):
        j = _shape(spark, sf_dir)
        plan = optimized_plan(j).lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan[:1500]


def test_bloom_filter_preserves_results(spark, sf_dir):
    with _confs(spark, BLOOM_CONFS):
        with_bloom = _shape(spark, sf_dir).collect()
    with _confs(
        spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        without = _shape(spark, sf_dir).collect()
    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, without))
