"""SparkSession factory tuned for this engine.

Scale notes: AQE is on so runtime re-planning (partition coalescing,
skew-join splitting) applies at any scale factor; shuffle partitions
default small for local test SFs and should be raised (or left to AQE
with a high initial value) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs the engine needs regardless of who built the
# session (the driver harness builds its own SparkSession):
#  - nanosAsLong: the testdata parquet stores TIMESTAMP(NANOS) which
#    vanilla Spark refuses; this legacy flag reads them as long
#    nanoseconds (io.py converts to TimestampType).
#  - parallelismFirst=false: make AQE coalesce shuffle reads to the
#    advisory partition size instead of padding out to default
#    parallelism — small intermediate shuffles collapse to few tasks
#    (3-10x lower stage overhead on multi-stage plans here) and large
#    shuffles are unaffected (they exceed the advisory size anyway).
#    This is the documented recommendation for busy clusters.
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-built session."""
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    return spark


def get_spark(
    app_name: str = "lambda-sample-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
