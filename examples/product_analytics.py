"""PRODUCT-ANALYTICS report: the behavior/statistics operators of
this repo composed into the readout a growth team pulls per
reporting period over the events stream:

  1. funnel       behavior.funnel_conversion — strict-order
                  view -> click -> purchase conversion
  2. attribution  behavior.last_touch_attribution — which channel
                  (event type) gets credit for each purchase
  3. experiment   stats.welch_ab_test — is the hash-assigned A/B
                  split moving per-type value? (null true by
                  construction on raw testdata: |t| should be small)
  4. retention    behavior.cohort_retention — day-0 cohort sizes and
                  the day-1 return rate

Every stage is the contract operator itself (no example-only logic).
tests/test_product_analytics.py pins the cross-consistency the
report relies on: attributed conversions add up to the purchase
event count, funnel step counts never increase, the A/B readout
covers every event type with finite statistics.

Run: python examples/product_analytics.py [sf_dir]
(default /root/testdata/sf0.001; prints the four frames).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from lambda_sample_spark.operators.behavior import (  # noqa: E402
    cohort_retention,
    funnel_conversion,
    last_touch_attribution,
)
from lambda_sample_spark.operators.common import events, r6  # noqa: E402
from lambda_sample_spark.operators.stats import welch_ab_test  # noqa: E402


def growth_report(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The four report frames, all derived from one events load."""
    ev = events(spark, sf_dir)
    retention = cohort_retention(ev)
    d0 = retention.where(F.col("offset_days") == 0).select(
        "cohort_day_ms", F.col("n_users").alias("d0_users")
    )
    d1 = retention.where(F.col("offset_days") == 1).select(
        "cohort_day_ms", F.col("n_users").alias("d1_users")
    )
    day1 = (
        d0.join(d1, "cohort_day_ms", "left")
        .na.fill(0, ["d1_users"])
        .select(
            "cohort_day_ms",
            "d0_users",
            "d1_users",
            r6(F.col("d1_users") / F.col("d0_users")).alias("d1_rate"),
        )
    )
    return {
        "funnel": funnel_conversion(ev),
        "attribution": last_touch_attribution(ev),
        "ab_test": welch_ab_test(ev),
        "retention_d1": day1,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from lambda_sample_spark.session import get_spark

    spark = get_spark(app_name="product-analytics")
    for name, df in growth_report(spark, sf_dir).items():
        print(f"== {name}")
        df.show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
