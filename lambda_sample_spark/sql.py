"""SQL surface of the engine: every testdata table as a temp view plus
reference queries expressed as plain Spark SQL.

The DataFrame operators in ``operators/`` are the primary API; this
module proves the same plans are reachable through ``spark.sql`` —
Catalyst compiles both to identical physical plans, so a user can mix
freely (e.g. the flagship anomaly query below is tested cell-equal to
``operators.anomaly.fast_anomaly``).

Views are registered per (session, sf_dir); names match the DuckDB
oracle views, so any ``oracle_sql()`` string is *almost* runnable here
too (dialect differences: ``epoch_ms`` -> ``unix_millis``,
``quantile_cont`` -> ``percentile``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace a temp view per testdata table (nanos-safe via
    load_table)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the registered testdata views."""
    register_views(spark, sf_dir)
    return spark.sql(query)


# The flagship fast-anomaly analysis (SURVEY.md §3.1) as one SQL
# statement: newest-200 window per key -> avg/stddev_pop/latest ->
# clamped score. Tested cell-equal to operators.anomaly.fast_anomaly.
FAST_ANOMALY_SQL = """
WITH recent AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
), agg AS (
  SELECT event_type,
         count(*) AS n,
         avg(value) AS avg_raw,
         stddev_pop(value) AS sd_raw,
         max(CASE WHEN rn = 1 THEN value END) AS latest_value
  FROM recent
  WHERE rn <= 200
  GROUP BY event_type
)
SELECT event_type, n,
       round(avg_raw, 6) AS avg_value,
       round(sd_raw, 6) AS sd_value,
       latest_value,
       CASE WHEN sd_raw = 0 THEN NULL
            ELSE round(least(greatest((abs(latest_value - avg_raw) - sd_raw)
                                      / (2 * sd_raw), 0.0), 1.0), 6)
       END AS fast_anomaly
FROM agg
"""


def fast_anomaly_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run(spark, sf_dir, FAST_ANOMALY_SQL)
