"""The reference's one join — model⋈readings key lookup — plus the
weighted ensemble that consumes it (SURVEY.md §2.4 J1, §2.2 P9).

Reference citations (/root/reference/):
  J1  per-sensor model fetch zipped with recent readings
      analyzer/Analyzer.scala:104-115 (fetchModel :155-165 may return
      None — left-outer semantics)
  P9  ``(35*fast + 65*full)/100`` with fallback to fast when the model
      is absent; Analyzer.scala:143-150

The "model store" (Redis hash keyed by sensor) is a tiny dimension:
re-expressed as a broadcast left join — zero shuffle of the fact side
at any scale. Here the dimension is derived deterministically from a
training slice of the events table (user_id % 4 != 0) and only exists
for a subset of keys, so the fallback path is exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scoring import weighted_ensemble
from .anomaly import fast_anomaly
from .common import events, r6

MODELED_TYPES = ["click", "error", "purchase"]  # signup/view have no model


def model_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stand-in for the Redis ``full-analysis`` hash: one row per
    modeled key with a [0,1] model score (derived from a held-out
    training slice so it is deterministic and oracle-checkable)."""
    ev = events(spark, sf_dir)
    return (
        ev.where(F.col("user_id") % 4 != 0)
        .where(F.col("event_type").isin(*MODELED_TYPES))
        .groupBy("event_type")
        .agg(r6(F.avg("value") / F.lit(500.0)).alias("model_score"))
    )


def lookup_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: per-key aggregate left-joined with the broadcast model dim;
    absent models surface as NULL (feeding P9's fallback)."""
    per_key = (
        events(spark, sf_dir)
        .groupBy("event_type")
        .agg(r6(F.avg("value")).alias("avg_value"))
    )
    dim = model_dim(spark, sf_dir)
    return per_key.join(F.broadcast(dim), on="event_type", how="left").select(
        "event_type", "avg_value", "model_score"
    )


def ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 on top of J1: blend the fast heuristic score with the model
    score, falling back to fast where no model exists."""
    fast = fast_anomaly(spark, sf_dir).select("event_type", "fast_anomaly")
    dim = model_dim(spark, sf_dir)
    joined = fast.join(F.broadcast(dim), on="event_type", how="left")
    return joined.select(
        "event_type",
        "fast_anomaly",
        "model_score",
        r6(
            weighted_ensemble(F.col("fast_anomaly"), F.col("model_score"))
        ).alias("ensemble"),
    )


_MODEL_CTE = """
model AS (
  SELECT event_type, round(avg(value) / 500.0, 6) AS model_score
  FROM events
  WHERE user_id % 4 != 0 AND event_type IN ('click', 'error', 'purchase')
  GROUP BY event_type
)
"""

_FAST_CTE = """
recent AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
fastagg AS (
  SELECT event_type,
         avg(value) AS avg_raw,
         stddev_pop(value) AS sd_raw,
         max(CASE WHEN rn = 1 THEN value END) AS latest_value
  FROM recent WHERE rn <= 200
  GROUP BY event_type
),
fast AS (
  SELECT event_type,
         CASE WHEN sd_raw = 0 THEN NULL
              ELSE round(least(greatest((abs(latest_value - avg_raw) - sd_raw)
                                        / (2 * sd_raw), 0.0), 1.0), 6)
         END AS fast_anomaly
  FROM fastagg
)
"""

ORACLE = {
    "q_lookup_join_left": f"""
WITH {_MODEL_CTE.strip()}
SELECT e.event_type,
       round(avg(e.value), 6) AS avg_value,
       any_value(m.model_score) AS model_score
FROM events e LEFT JOIN model m ON e.event_type = m.event_type
GROUP BY e.event_type
""",
    "q_weighted_ensemble": f"""
WITH {_FAST_CTE.strip()},
{_MODEL_CTE.strip()}
SELECT f.event_type, f.fast_anomaly, m.model_score,
       round(CASE WHEN m.model_score IS NULL THEN f.fast_anomaly
                  ELSE (35.0 * f.fast_anomaly + 65.0 * m.model_score) / 100.0
             END, 6) AS ensemble
FROM fast f LEFT JOIN model m ON f.event_type = m.event_type
""",
}

QUERIES = {
    "q_lookup_join_left": lookup_join_left,
    "q_weighted_ensemble": ensemble,
}
