"""The reference's flagship query: per-sensor fast anomaly analysis.

Reference semantics (file:line in /root/reference/):
  - per sensor, take the newest ``recent=200`` readings
    (CassandraClient.scala:23-25,38-43; application.conf:13);
  - mean + POPULATION std-dev over the window (Analyzer.scala:47-52);
  - score the newest value: ``(|v - avg| - sd) / (2*sd)`` clamped to
    [0,1] (Analyzer.scala:54-58);
  - the per-sensor loop (Analyzer.scala:105-109) is ``groupBy`` here.

Spark plan shape: scan -> window row_number (one shuffle by key) ->
partial+final aggregate -> scalar expression. At 100 TB the window
shuffle is the only wide stage; with the store partitioned by key and
sorted by ts (as the reference's Cassandra layout guarantees) the
row_number degenerates to a per-partition streaming pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scoring import clamp01, heuristic_score
from .common import RECENT_N, events, r6

def recent_window():
    return Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )


def recent_per_key(df: DataFrame, n: int = RECENT_N) -> DataFrame:
    """W1: newest-n-rows-per-key (the clustering-order + LIMIT idiom,
    schema.sql:9-10 + CassandraClient.scala:41)."""
    return df.withColumn("rn", F.row_number().over(recent_window())).where(F.col("rn") <= n)


def fast_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the full fast-analysis pipeline (Analyzer.scala:47-59,138-151)."""
    recent = recent_per_key(events(spark, sf_dir))
    agg = recent.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("avg_raw"),
        F.stddev_pop("value").alias("sd_raw"),
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("latest_value"),
    )
    score = heuristic_score(
        F.col("latest_value"), F.col("avg_raw"), F.col("sd_raw")
    )
    return agg.select(
        "event_type",
        "n",
        r6(F.col("avg_raw")).alias("avg_value"),
        r6(F.col("sd_raw")).alias("sd_value"),
        F.col("latest_value"),
        r6(score).alias("fast_anomaly"),
    )


def clamp_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: clamp-to-[0,1] as a standalone scalar operator."""
    df = events(spark, sf_dir)
    return df.select(
        "event_id",
        r6(clamp01((F.col("value") - F.lit(100.0)) / F.lit(300.0))).alias("clamped"),
    )


def robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sensor robust-statistics outlier census: median + MAD
    (median absolute deviation) per event_type, and the count of
    events whose |value - median| exceeds 3σ under the normal-
    consistency scaling (1.4826 · MAD) — the breakdown-resistant twin
    of the mean/stddev sweep in ``fast_anomaly`` (a single wild value
    shifts a mean; it cannot shift a median). Cf. reference
    Analyzer.scala:79-96, which scores against mean ± 3·stddev.

    Shape: two grouped exact-percentile passes over the fact table
    (median, then MAD on the deviations) + one filtered count; the
    per-type stats frames are |types| rows, so both join legs
    broadcast and the fact table never shuffles on anything but its
    group key. Exact ``percentile`` is the oracle-parity choice at
    test SF; at 100 TB swap to ``percentile_approx`` exactly as the
    quantile rows document."""
    ev = events(spark, sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type", "med").agg(
        F.expr("percentile(ad, 0.5D)").alias("mad")
    )
    flagged = (
        ev.join(F.broadcast(mad), "event_type")
        .where(
            F.abs(F.col("value") - F.col("med")) > 4.4478 * F.col("mad")
        )
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_outliers"))
    )
    return (
        mad.join(flagged, "event_type", "left")
        .select(
            "event_type",
            r6(F.col("med")).alias("median"),
            r6(F.col("mad")).alias("mad"),
            F.coalesce(F.col("n_outliers"), F.lit(0).cast("bigint")).alias(
                "n_outliers"
            ),
        )
    )


ORACLE = {
    "q_fast_anomaly": """
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
  FROM recent WHERE rn <= 200
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
""",
    "q_clamp_score": """
SELECT event_id,
       round(least(greatest((value - 100.0) / 300.0, 0.0), 1.0), 6) AS clamped
FROM events
""",
}

ORACLE["q_robust_zscore"] = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), mad AS (
  SELECT e.event_type, m.med, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1, 2
), flagged AS (
  SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_outliers
  FROM events e JOIN mad USING (event_type)
  WHERE abs(e.value - mad.med) > 4.4478 * mad.mad
  GROUP BY 1
)
SELECT mad.event_type,
       round(mad.med, 6) AS median,
       round(mad.mad, 6) AS mad,
       coalesce(flagged.n_outliers, 0) AS n_outliers
FROM mad LEFT JOIN flagged USING (event_type)
"""

QUERIES = {
    "q_fast_anomaly": fast_anomaly,
    "q_clamp_score": clamp_score,
}

QUERIES_TAIL = {"q_robust_zscore": robust_zscore}
