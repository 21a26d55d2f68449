"""Sensor OBSERVABILITY pipeline: the telemetry-side operators of
this repo composed into the flow a monitoring stack runs per
reporting period (the reference's domain — its lambda architecture
serves exactly this kind of per-sensor health view; cf.
Analyzer.scala's per-sensor sweep):

  1. regularize     sessions.resample_gapfill — irregular readings
                    to a fixed per-sensor grid (LOCF + interpolation)
  2. baseline       anomaly.seasonal_baseline — per-(sensor, hour-of-
                    day) profile from the first half of the range,
                    2σ deviation census on the second half
  3. robust sweep   anomaly.robust_zscore — median/MAD outlier
                    counts, immune to the very outliers it hunts
  4. incident scope rangejoin.interval_semi_join — which non-error
                    events landed inside an error incident window
  5. drift          drift.psi — has each sensor's value distribution
                    shifted between the two halves?

Every stage is the contract operator itself (no example-only logic);
the composition returns one compact per-sensor health frame:

  (event_type, n_slots, n_seasonal_flags, n_robust_outliers,
   n_in_incident, psi)

tests/test_observability_pipeline.py pins the composition: each
column equals the stand-alone operator's aggregate over the same
input, and the pipeline runs end-to-end on driver testdata.

Run: python examples/observability_pipeline.py [sf_dir]
(default /root/testdata/sf0.001; prints the health frame).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lambda_sample_spark.operators.anomaly import (  # noqa: E402
    robust_zscore,
    seasonal_baseline,
)
from lambda_sample_spark.operators.common import events, ts_ms  # noqa: E402
from lambda_sample_spark.operators.drift import q_drift_psi  # noqa: E402
from lambda_sample_spark.operators.rangejoin import (  # noqa: E402
    WINDOW_MS,
    interval_semi_join,
)
from lambda_sample_spark.operators.sessions import (  # noqa: E402
    q_resample_gapfill,
)


def sensor_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per sensor (event_type) summarizing the five stages."""
    slots = (
        q_resample_gapfill(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_slots"))
    )
    seasonal = (
        seasonal_baseline(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.sum("n_flagged").cast("bigint").alias("n_seasonal_flags"))
    )
    robust = robust_zscore(spark, sf_dir).select(
        "event_type", F.col("n_outliers").alias("n_robust_outliers")
    )
    ev = events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select(
        ts_ms().alias("s"), (ts_ms() + WINDOW_MS).alias("e")
    )
    probe = ev.where(F.col("event_type") != "error").select(
        "event_type", ts_ms().alias("t")
    )
    incident = (
        interval_semi_join(probe, err, "t", "s", "e")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_in_incident"))
    )
    drift = q_drift_psi(spark, sf_dir).select("event_type", "psi")
    return (
        slots.join(seasonal, "event_type", "left")
        .join(robust, "event_type", "left")
        .join(incident, "event_type", "left")
        .join(drift, "event_type", "left")
        .na.fill(0, ["n_seasonal_flags", "n_robust_outliers", "n_in_incident"])
        .orderBy("event_type")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from lambda_sample_spark.session import get_spark

    spark = get_spark(app_name="observability-pipeline")
    sensor_health(spark, sf_dir).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
