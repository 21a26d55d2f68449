"""Structured Streaming re-expression of the reference's speed layer
(SURVEY.md §2.6, §3.2, §7 Phase 4).

Reference wiring (/root/reference/):
  T1 producer tick 200 ms       mqtt/Producer.scala:110-114
  S4 decode                     mqtt/Consumer.scala:53-57
  T4 ingest-time timestamping   Consumer.scala:64 (ms precision —
     timestamps are truncated to ms for Cassandra fidelity)
  S5 keyed upsert               Consumer.scala:59-66
  T2/T6 snapshot refresh with change detection
                                HistoryWriter.scala:41-54,89-101
  T5 count-window re-analysis   CassandraClient.scala:23-25

Design choices (SURVEY.md §7 hard parts):
  - The entry store is an append-only parquet log + read-side
    last-write-wins view (lww_entries) — the Delta-MERGE-free way to
    reproduce Cassandra's keyed-upsert semantics. Exactly-once =
    checkpointing + idempotent keyed reads.
  - The per-key count window (newest 200) is recomputed from the store
    each trigger via foreachBatch — exactly what the reference does
    (re-read Cassandra per Analyze); the stateful
    flatMapGroupsWithState variant is intentionally not the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.generator import ANOMALY_RATE, BOUND, SENSORS

ENTRY_SCHEMA = "sensor STRING, ts TIMESTAMP, value DOUBLE, anomaly INT"


def sensor_stream(spark: SparkSession, rows_per_second: int = 20) -> DataFrame:
    """S1/T1 as a rate source: 20 rows/s ≈ 4 sensors x 1 msg / 200 ms
    (application.conf:6-7), transformed into the MqttEntry shape with
    the producer's two regimes (Producer.scala:62-66)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    # Materialize every random draw ONCE in its own projection:
    # nondeterministic expressions are re-evaluated per reference, so
    # deriving anomaly and value from the same F.rand() call tree
    # would let the label and the regime disagree.
    drawn = rate.select(
        F.col("timestamp").alias("rate_ts"),
        F.col("value").alias("seq"),
        F.rand(42).alias("r_regime"),
        F.rand(43).alias("r_sign"),
        F.rand(44).alias("r_norm"),
        F.rand(45).alias("r_anom"),
    )
    sensor = F.element_at(
        F.array(*[F.lit(s) for s in SENSORS]),
        (F.col("seq") % len(SENSORS) + 1).cast("int"),
    )
    anomaly = (F.col("r_regime") < ANOMALY_RATE).cast("int")
    sign = F.when(F.col("r_sign") < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    normal_mag = F.floor(F.col("r_norm") * BOUND)
    anomal_mag = BOUND + F.floor(F.col("r_anom") * (BOUND // 2))
    val = sign * F.when(anomaly == 1, anomal_mag).otherwise(normal_mag)
    # T4: ingest-time timestamp truncated to ms (Cassandra stores ms).
    # The rate source's per-row timestamp spreads rows across the
    # second, so (sensor, ts) stays unique at any rows_per_second up to
    # ~1000/len(SENSORS) — current_timestamp() would stamp every row of
    # a micro-batch identically and the keyed upsert would collapse
    # each batch to one row per sensor.
    ts_ms = F.timestamp_millis(F.unix_millis(F.col("rate_ts")))
    return drawn.select(
        sensor.alias("sensor"),
        ts_ms.alias("ts"),
        val.cast("double").alias("value"),
        anomaly.alias("anomaly"),
    )


def start_ingest(
    spark: SparkSession,
    entry_dir: str,
    checkpoint_dir: str,
    rows_per_second: int = 20,
    trigger_ms: int = 200,
):
    """S5: ingest the sensor stream into the entry store.

    foreachBatch appends with the batch id as the write version; the
    keyed-upsert contract is realized by reading through lww_entries.
    Checkpointing makes replays idempotent (same (sensor, ts, batch)
    keys overwrite in the read-side dedup).
    """
    stream = sensor_stream(spark, rows_per_second)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(entry_dir)
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )


def lww_entries(spark: SparkSession, entry_dir: str) -> DataFrame:
    """Read-side last-write-wins view of the append log: newest write
    per (sensor, ts) wins — reproduces CQL UPDATE semantics
    (Consumer.scala:59-66)."""
    log = spark.read.schema(ENTRY_SCHEMA + ", batch_id LONG").parquet(entry_dir)
    w = Window.partitionBy("sensor", "ts").orderBy(F.col("batch_id").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )


def vacuum_lww(spark: SparkSession, entry_dir: str) -> tuple[int, int]:
    """Maintenance rewrite of the append log: materialize the
    last-write-wins view back over the store, discarding superseded
    (sensor, ts) versions — the upsert store's vacuum. The read-side
    LWW view stays correct before AND after (idempotent); what changes
    is storage and the window work every subsequent read pays.
    Returns (rows_before, rows_after). Same EXCLUSIVE maintenance
    window assumption as compact_parquet: the rmtree + move swap is
    not atomic, so no reader may race it. The concurrent-reader
    production shape is sources/warehouse.merge_versioned — the same
    LWW semantics as a bounded-work MERGE with atomic pointer-swap
    commits."""
    import shutil

    log = spark.read.schema(ENTRY_SCHEMA + ", batch_id LONG").parquet(entry_dir)
    rows_before = log.count()
    winners = lww_entries(spark, entry_dir).withColumn(
        "batch_id", F.lit(0).cast("long")
    )
    tmp = entry_dir.rstrip("/") + "__vacuum_tmp"
    winners.write.mode("overwrite").parquet(tmp)
    rows_after = spark.read.parquet(tmp).count()
    shutil.rmtree(entry_dir)
    shutil.move(tmp, entry_dir)
    return rows_before, rows_after


def refresh_snapshot(
    spark: SparkSession, entry_dir: str, snapshot_dir: str, recent_n: int = 200
) -> bool:
    """T2/T6: recompute the per-sensor fast analysis from the store and
    overwrite the snapshot table; returns False (skip) when nothing
    changed since the last snapshot (HistoryWriter.scala:89-101).

    The recompute itself is serving.speed_snapshot — the SAME
    definition the live serving query uses, so snapshot table and
    query cannot drift. Change detection reads (max ts, max batch_id)
    from the append log: max(ts) alone misses an LWW OVERWRITE of an
    existing (sensor, ts) key (new data, same max ts — the exact
    upsert the store exists for), while every append — overwrites
    included — lands under a fresh micro-batch id. The previous
    signal rides in a sidecar file, not the snapshot schema."""
    import json as _json
    import os as _os

    # local import: serving imports lww_entries from this module at
    # module level, so the reverse edge must stay function-local
    from .serving import speed_snapshot

    log = spark.read.schema(ENTRY_SCHEMA + ", batch_id LONG").parquet(entry_dir)
    sig_row = log.agg(
        F.unix_millis(F.max("ts")).alias("ts"), F.max("batch_id").alias("b")
    ).collect()[0]
    cur_sig = [sig_row["ts"], sig_row["b"]]
    sig_path = _os.path.join(snapshot_dir, "_change_signal.json")
    try:
        with open(sig_path) as fh:
            if _json.load(fh) == cur_sig:
                return False  # notUpdatedYet — skip the write
    except Exception:
        pass  # first snapshot (or unreadable signal: refresh anyway)
    snap = speed_snapshot(lww_entries(spark, entry_dir), recent_n)
    snap.write.mode("overwrite").parquet(snapshot_dir)
    with open(sig_path, "w") as fh:
        _json.dump(cur_sig, fh)
    return True
