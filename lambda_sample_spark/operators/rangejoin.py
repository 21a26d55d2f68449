"""Time-range (interval) join via bin bucketing (SURVEY.md §2.8
adjunct): flag probe rows that fall inside ANY of a set of intervals —
the "events during an incident window" / "reading during a maintenance
window" query every telemetry engine needs (cf. the reference's
anomaly sweep, which scans a recent window per sensor;
Analyzer.scala:79-96 is the per-sensor fixed-window cousin).

A naive interval join is a non-equi theta join — Spark can only
BroadcastNestedLoop it, which dies as soon as the interval side stops
fitting in memory. The Spark-first shape used here is the classic
bin-bucketed range join (the same strategy Databricks' range-join hint
implements): quantize time into fixed-width bins, explode each
interval over the bins it covers (bounded by interval_len/bin + 1
rows), equi-join probe.bin = interval.bin, and re-check the exact
range predicate. Both sides shuffle ONCE on the bin key — a plain
hash join a 1000-executor cluster partitions like any other — and the
LEFT SEMI form dedups "inside several overlapping intervals" for free
(no distinct pass, probe side never duplicates).

100 TB notes: bin width trades interval-side expansion (len/bin + 1
copies) against probe-side bucket width; pick it near the median
interval length. Hot bins (incident storms) are ordinary join skew —
AQE's skew-join splitting applies because this IS a plain equi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import events, ts_ms

# 5-minute incident windows over ms-precision timestamps
WINDOW_MS = 300_000
BIN_MS = 300_000


def interval_semi_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start: str,
    end: str,
    bin_ms: int = BIN_MS,
) -> DataFrame:
    """Rows of ``probe`` whose ``probe_ts`` (ms) lies inside ANY
    ``[start, end]`` interval (ms, inclusive). Returns probe columns
    unchanged (LEFT SEMI — each qualifying probe row exactly once,
    however many intervals cover it).

    Plan shape: interval explode is bounded by (end-start)/bin_ms + 1
    rows per interval; the join is a single equi hash join on the bin
    with the exact range check as a residual condition."""
    iv = intervals.select(
        F.col(start).alias("_s"),
        F.col(end).alias("_e"),
    ).withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("_s") / bin_ms), F.floor(F.col("_e") / bin_ms)
            )
        ),
    )
    pb = probe.withColumn("_bin", F.floor(F.col(probe_ts) / bin_ms))
    out = pb.join(
        iv,
        (pb["_bin"] == iv["_bin"])
        & (pb[probe_ts] >= iv["_s"])
        & (pb[probe_ts] <= iv["_e"]),
        "left_semi",
    )
    return out.drop("_bin")


def q_interval_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract (tail): per-type census of non-error events that fall
    within 5 minutes after ANY error event (global incident windows —
    no user key, so this is the genuinely non-equi large×large case).
    Oracle replays it as an EXISTS range subquery."""
    ev = events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select(
        ts_ms().alias("s"), (ts_ms() + WINDOW_MS).alias("e")
    )
    probe = ev.where(F.col("event_type") != "error").select(
        "event_id", "event_type", ts_ms().alias("t")
    )
    flagged = interval_semi_join(probe, err, "t", "s", "e")
    return flagged.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_flagged")
    )


ORACLE = {
    "q_interval_flag": f"""
WITH err AS (
  SELECT epoch_ms(ts) AS s, epoch_ms(ts) + {WINDOW_MS} AS e
  FROM events WHERE event_type = 'error'
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_flagged
FROM events e
WHERE e.event_type <> 'error'
  AND EXISTS (
    SELECT 1 FROM err
    WHERE epoch_ms(e.ts) >= err.s AND epoch_ms(e.ts) <= err.e
  )
GROUP BY e.event_type
""",
}

QUERIES: dict = {}

QUERIES_TAIL = {"q_interval_flag": q_interval_flag}
