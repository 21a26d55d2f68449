"""Serving-path observability as QUERIES over a persisted metrics
table — the reference's ``/perf`` route (Dashboard.scala:82-104 +
Endpoint.scala:105-109) spawns a load generator, regex-parses its CSV
and lets the browser compute the A7-A9 box-plot stats; here the
serving endpoint logs every request it actually handles, flushes
micro-batches into a parquet request log (plus mergeable profile
partials — streaming/profile.py reused verbatim), and ``/perf``
answers with the same box-plot aggregates the contract's A8/A9 rows
(aggregates.py quantiles/iqr_outliers) compute, run over the log.

Layout under ``metrics_dir``:
  requests/  — raw append-only micro-batches: (ts, route, status,
               dur_ms); one file per flush, tiny — the 100 TB note is
               that request logs grow with traffic, not data size, and
               daily compaction (sources/warehouse.py machinery) keeps
               file counts bounded.
  partials/  — per-flush mergeable profile partials keyed by (minute
               window, route): counts, decimal sums, extents, HLL of
               status codes. Rollups over ANY horizon come from
               merge_profile_partials without re-reading raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .profile import (
    finalize_profile,
    merge_profile_partials,
    windowed_profile_partials,
)

REQUEST_SCHEMA = "ts TIMESTAMP, route STRING, status INT, dur_ms DOUBLE"


def flush_requests(
    spark: SparkSession, rows: list[tuple], metrics_dir: str
) -> int:
    """Append one micro-batch of request records (and its profile
    partials) to the metrics table; returns rows written. ``rows`` are
    (datetime, route, status, dur_ms) tuples from the endpoint's
    in-memory buffer."""
    if not rows:
        return 0
    batch = spark.createDataFrame(rows, REQUEST_SCHEMA)
    batch.write.mode("append").parquet(f"{metrics_dir}/requests")
    partials = windowed_profile_partials(
        batch,
        value_col="dur_ms",
        distinct_col="status",
        window="1 minute",
        ts_col="ts",
        extra_keys=("route",),
    )
    partials.write.mode("append").parquet(f"{metrics_dir}/partials")
    return len(rows)


def perf_box_stats(reqs: DataFrame) -> DataFrame:
    """Per-route box plot over request durations — the A8 exact
    quantile expression (aggregates.py:quantiles) and the A9 1.5·IQR
    whisker rule (aggregates.py:iqr_outliers) applied to the serving
    log: (route, n, mean_ms, q1, median, q3, lo_whisker, hi_whisker,
    n_outliers, max_ms)."""
    q = F.expr("percentile(dur_ms, array(0.25D, 0.5D, 0.75D))")
    stats = reqs.groupBy("route").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("dur_ms"), 3).alias("mean_ms"),
        q.alias("q"),
        F.max("dur_ms").alias("max_ms"),
    )
    iqr = F.col("q")[2] - F.col("q")[0]
    bounds = stats.select(
        "route",
        "n",
        "mean_ms",
        F.round(F.col("q")[0], 3).alias("q1"),
        F.round(F.col("q")[1], 3).alias("median"),
        F.round(F.col("q")[2], 3).alias("q3"),
        # the outlier census classifies against the UNROUNDED 1.5·IQR
        # bounds (the documented A9 rule) — rounding is display-only,
        # and classifying against rounded bounds would miscount values
        # within 0.0005 ms of the true whisker
        (F.col("q")[0] - 1.5 * iqr).alias("lo_raw"),
        (F.col("q")[2] + 1.5 * iqr).alias("hi_raw"),
        F.round(F.col("q")[0] - 1.5 * iqr, 3).alias("lo_whisker"),
        F.round(F.col("q")[2] + 1.5 * iqr, 3).alias("hi_whisker"),
        F.round("max_ms", 3).alias("max_ms"),
    )
    # outlier census the A9 way: broadcast the tiny per-route bounds
    # back over the log (never collect_list the durations — the log is
    # unbounded, the bounds table is |routes| rows)
    outliers = (
        reqs.join(F.broadcast(bounds.select("route", "lo_raw", "hi_raw")), "route")
        .where(
            (F.col("dur_ms") < F.col("lo_raw"))
            | (F.col("dur_ms") > F.col("hi_raw"))
        )
        .groupBy("route")
        .agg(F.count("*").cast("bigint").alias("n_outliers"))
    )
    return (
        bounds.join(outliers, "route", "left")
        .withColumn("n_outliers", F.coalesce("n_outliers", F.lit(0)))
        .select(
            "route", "n", "mean_ms", "q1", "median", "q3",
            "lo_whisker", "hi_whisker", "n_outliers", "max_ms",
        )
    )


def perf_report(spark: SparkSession, metrics_dir: str) -> list[dict]:
    """The ``/perf`` payload: per-route box-plot stats from the raw
    log joined with the partial-merged profile (mean/extents/
    completeness derived WITHOUT re-aggregating raw rows — the partial
    path is the one that scales to long horizons)."""
    reqs = spark.read.schema(REQUEST_SCHEMA).parquet(f"{metrics_dir}/requests")
    box = perf_box_stats(reqs)
    partials = spark.read.parquet(f"{metrics_dir}/partials")
    prof = finalize_profile(
        merge_profile_partials(partials, bucket_expr=F.col("route"))
    ).select(
        F.col("bucket").alias("route"),
        F.col("n_rows").alias("profile_n"),
        F.col("mean").alias("profile_mean_ms"),
        F.col("min_val").alias("min_ms"),
        F.col("n_distinct_est").alias("n_statuses_est"),
    )
    out = box.join(prof, "route", "left").orderBy("route")
    return [r.asDict() for r in out.collect()]
