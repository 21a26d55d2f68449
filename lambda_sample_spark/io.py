"""Testdata loaders.

Tables (driver-generated parquet under /root/testdata/sf*/):
  region nation customer supplier part orders lineitem events documents
  embeddings

The parquet files store timestamps as TIMESTAMP(NANOS); Spark reads them
as long nanoseconds under ``spark.sql.legacy.parquet.nanosAsLong`` and we
convert to TimestampType (microsecond precision, matching what DuckDB
presents for the same files) here, using integer division so no precision
is lost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import apply_runtime_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns written as TIMESTAMP(NANOS) that surface as long ns.
TS_NS_COLUMNS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in TS_NS_COLUMNS.get(name, []):
        if dtypes.get(c) == "bigint":
            # integer ns -> integer us (div = integral division, no
            # double round-trip), then reinterpret as timestamp.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # micros-precision timestamps come back as TIMESTAMP_NTZ under
    # Spark 4's NTZ inference; normalize to TimestampType (session TZ
    # is UTC, so wall-clock values are preserved, matching DuckDB's
    # naive reading of the same files).
    for c, t in df.dtypes:
        if t == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def parquet_num_rows(sf_dir: str, name: str) -> int | None:
    """Exact row count of a testdata table from parquet FOOTER metadata
    — a driver-side file read of a few KB, no Spark job. The cheap way
    to size parameters (LSH bits, k-means k) that only need N: at
    100 TB a full-scan count() job whose sole output is an integer is a
    wasted cluster pass; the footer already stores the answer.

    Handles both a single ``<name>.parquet`` file and a directory of
    part files. Returns None when the path doesn't exist or isn't
    parquet (callers fall back to a Spark count)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet") and not f.startswith((".", "_")):
                        total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            return total
    except Exception:
        return None
    return None


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
