"""Shared helpers for contract operators.

Contract conventions (driver compares Spark vs DuckDB by row count +
schema + order-insensitive value hash):
  - timestamps are surfaced as epoch-millis BIGINT (``*_ms``) so both
    engines hash identical integers;
  - every float aggregate is rounded to 6 decimals in BOTH engines;
  - integer outputs are cast to BIGINT to match DuckDB's wider types;
  - window orderings always carry a unique tiebreaker (event_id) so
    top-k / row_number results are deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table

# The reference loops over a configured sensor fleet
# (application.conf:7); our events table plays that role with
# event_type as the sensor key (5 known types in the driver testdata).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# window sizes mirroring application.conf:13-14 (recent=200, full=20000)
RECENT_N = 200
FULL_N = 20000

ROUND = 6


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def ts_ms(c: Column | str = "ts") -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_millis(c)


def r6(c: Column) -> Column:
    return F.round(c, ROUND)


def fan_out(df: DataFrame) -> DataFrame:
    """The playbook single-file fan-out gate: CPU-bound per-row passes
    (interpreted-HOF gram hashing, Python decode) over a small parquet
    input otherwise run on the 2 partitions the scan packs into —
    round-robin repartition to defaultParallelism when the input is
    under-partitioned; a no-op on real multi-split sources. Do NOT
    apply ahead of JVM-codegen map sides (measured net-negative for
    ccnet's tokenizer — see ccnet._tokens)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def r6z(c: Column) -> Column:
    """round(c, 6) with the IEEE negative-zero pairing: a tiny
    negative rounds to -0.0 in DuckDB but +0.0 in Spark, and the
    driver's value compare distinguishes them (bit q_weighted_sample
    at sf0.1). Use for any rounded output whose input can be a tiny
    negative, PAIRED with `round(..., 6) + CAST(0.0 AS DOUBLE)` in the
    oracle (-0.0 + 0.0 = +0.0 under round-to-nearest; a no-op for
    every other value)."""
    return F.round(c, ROUND) + F.lit(0.0)
