"""Window / sort / top-k / keyed-upsert operators.

Reference citations (/root/reference/):
  W1  per-key newest-n   schema.sql:9-10; CassandraClient.scala:38-43
  S7  partition scan+limit CassandraClient.scala:38-43
  S5  keyed upsert (last-write-wins) mqtt/Consumer.scala:59-66
  T6  change detection / write-skipping HistoryWriter.scala:89-101

Scale notes: every operator here is a single hash-shuffle on the group
key followed by a streaming per-partition pass (rank/lag). No driver
collects, no UDFs; skewed keys are handled by AQE. The LIMIT in
scan_filter_limit compiles to TakeOrderedAndProject (per-partition
top-k then a single merge of k rows — no global sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .anomaly import recent_per_key
from .common import events, ts_ms

def scan_filter_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7/P1/P3/W3: WHERE key = lit ORDER BY ts DESC LIMIT n."""
    return (
        events(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(100)
        .select(
            "event_id", ts_ms().alias("ts_ms"), "user_id", "event_type", "value", "props"
        )
    )


def recent_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: newest 50 rows per key with their rank."""
    return recent_per_key(events(spark, sf_dir), n=50).select(
        "event_type",
        "event_id",
        ts_ms().alias("ts_ms"),
        "value",
        F.col("rn").cast("bigint").alias("rn"),
    )


def upsert_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6: last-write-wins keyed upsert, read-side formulation.

    The reference's store is a keyed map (CQL UPDATE on (sensor, ts) —
    Consumer.scala:59-66): re-writes overwrite. On an append-only log
    the equivalent view keeps only the newest row per key.
    Key here: (event_type, user_id); version order: (ts, event_id).
    """
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "user_id", ts_ms().alias("ts_ms"), "value")
    )


def change_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: write-skipping — keep only rows whose value changed vs the
    previous row of the same key (HistoryWriter.scala:89-101 skips the
    upsert when the snapshot ts is unchanged)."""
    w = Window.partitionBy("event_type").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("value").over(w)
    return (
        events(spark, sf_dir)
        .withColumn("prev_value", prev)
        .where(F.col("prev_value").isNull() | (F.col("value") != F.col("prev_value")))
        .select("event_type", "event_id", ts_ms().alias("ts_ms"), "value")
    )


ORACLE = {
    "q_scan_filter_limit": """
SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value, props
FROM (
  SELECT * FROM events WHERE event_type = 'click'
  ORDER BY ts DESC, event_id DESC LIMIT 100
) t
""",
    "q_recent_topk": """
SELECT event_type, event_id, epoch_ms(ts) AS ts_ms, value, CAST(rn AS BIGINT) AS rn
FROM (
  SELECT event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn <= 50
""",
    "q_upsert_lww": """
SELECT event_type, user_id, epoch_ms(ts) AS ts_ms, value
FROM (
  SELECT event_type, user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY event_type, user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
""",
    "q_change_detect": """
SELECT event_type, event_id, epoch_ms(ts) AS ts_ms, value
FROM (
  SELECT event_type, event_id, ts, value,
         lag(value) OVER (PARTITION BY event_type
                          ORDER BY ts ASC, event_id ASC) AS prev_value
  FROM events
) t
WHERE prev_value IS NULL OR value != prev_value
""",
}

QUERIES = {
    "q_scan_filter_limit": scan_filter_limit,
    "q_recent_topk": recent_topk,
    "q_upsert_lww": upsert_lww,
    "q_change_detect": change_detect,
}
