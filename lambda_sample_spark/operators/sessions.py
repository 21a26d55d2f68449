"""Temporal / window-function operators over the events stream.

The reference's only window is the per-key newest-n scan (SURVEY.md
§2.5 W1); a training-data pipeline needs the full temporal toolbox:
sessionization, tumbling windows, sliding aggregates, ordered deltas,
and rank statistics. All are single-shuffle window operators — hash
partition on the key, then one ordered pass per partition.

Scale notes: every query here shuffles once on its partition key
(user_id / event_type) and streams within partitions; no driver
collects, no UDFs, all whole-stage-codegen expressions. Skewed keys
are split by AQE. The tumbling window uses ``F.window`` — the same
operator Structured Streaming uses, so the batch and streaming
formulations are literally identical code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .common import events, r6, ts_ms

SESSION_GAP_MS = 30 * 60 * 1000  # 30 min


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is
    idle > 30 min. lag -> flag -> running sum = session id; then one
    group-by for per-session stats. (Streaming twin:
    ``F.session_window(ts, "30 minutes")``.)"""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = ts_ms() - F.lag(ts_ms()).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_MS), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = events(spark, sf_dir).withColumn(
        "session_id", F.sum(is_new).over(run).cast("bigint")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min(ts_ms()).alias("session_start_ms"),
        F.max(ts_ms()).alias("session_end_ms"),
        F.count("*").alias("n_events"),
    )


def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type — the batch expression of
    the streaming windowed aggregate (identical ``F.window`` operator).

    The average is computed as an exact DECIMAL sum divided by the
    count, not float ``avg``: double summation is order-dependent, and
    at sf0.1 one group's mean lands exactly on a round-half digit
    where Spark's and DuckDB's accumulation orders differ by 1 ULP —
    43.4728125 rounding to .472812 vs .472813. Decimal sums are
    associative and engine-identical, so round(sum/n, 6) matches at
    every SF. (The other avg-based contract rows never hit a knife
    edge on this corpus; this one is hardened because it did.)"""
    ev = events(spark, sf_dir)
    exact_sum = F.sum(F.col("value").cast("decimal(28,10)"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # divide by count(value), not count(*): decimal sum skips
            # NULLs, so avg semantics must skip them in the divisor too
            r6(exact_sum.cast("double") / F.count("value")).alias("avg_value"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding count-window stats per key: min/max/count over the
    current + 9 preceding rows in (ts, event_id) order."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    ev = events(spark, sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        ts_ms().alias("ts_ms"),
        F.min("value").over(w).alias("mov_min"),
        F.max("value").over(w).alias("mov_max"),
        F.count("*").over(w).alias("mov_n"),
        r6(F.avg("value").over(w)).alias("mov_avg"),
    )


def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered-window function pack, one row per event:

    - lag/lead inter-arrival deltas per user (ms); NULL at the edges;
    - rank / dense_rank / percent_rank of value within each event_type
      (deterministic tie-break on event_id via the value+id ordering).

    Two window specs = two shuffles (user_id then event_type) — the
    minimum for two different partition keys; each is a single ordered
    pass, whole-stage-codegen'd, no UDFs."""
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_ms().alias("ts_ms"),
        (ts_ms() - F.lag(ts_ms()).over(wu)).alias("delta_prev_ms"),
        (F.lead(ts_ms()).over(wu) - ts_ms()).alias("delta_next_ms"),
        F.rank().over(wt).alias("rnk"),
        F.dense_rank().over(wt).alias("drnk"),
        r6(F.percent_rank().over(wt)).alias("pct_rank"),
    )


ORACLE = {
    "q_sessionize": f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_MS}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), numbered AS (
  SELECT user_id, ts_ms,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts_ms) AS session_start_ms,
       max(ts_ms) AS session_end_ms,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
    "q_tumbling_window": """
SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms,
       event_type,
       count(*) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) / count(value),
             6) AS avg_value
FROM events
GROUP BY 1, 2
""",
    "q_moving_stats": """
SELECT event_id, event_type, epoch_ms(ts) AS ts_ms,
       min(value) OVER w AS mov_min,
       max(value) OVER w AS mov_max,
       count(*) OVER w AS mov_n,
       round(avg(value) OVER w, 6) AS mov_avg
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
""",
    "q_window_funcs": """
SELECT event_id, user_id, event_type, value, epoch_ms(ts) AS ts_ms,
       epoch_ms(ts) - lag(epoch_ms(ts)) OVER wu AS delta_prev_ms,
       lead(epoch_ms(ts)) OVER wu - epoch_ms(ts) AS delta_next_ms,
       rank() OVER wt AS rnk,
       dense_rank() OVER wt AS drnk,
       round(percent_rank() OVER wt, 6) AS pct_rank
FROM events
WINDOW wu AS (PARTITION BY user_id ORDER BY ts, event_id),
       wt AS (PARTITION BY event_type ORDER BY value, event_id)
""",
}

QUERIES = {
    "q_sessionize": sessionize,
    "q_tumbling_window": tumbling_window,
    "q_moving_stats": moving_stats,
    "q_window_funcs": window_funcs,
}
