"""Redis-hash-shaped KV store + sink (SURVEY.md §2 S10).

Reference wiring (/root/reference/):
  hset(modelsKey, sensor, bytes)    Trainer.scala:46 (serialized models)
  hset(historyKey, sensor, bytes)   HistoryWriter.scala:72 (snapshots)
  keyed read-back                   analysis layer (S11 lookups)

Spark-first re-expression: one versioned, hash-bucketed parquet table
with rows ``(hkey STRING, field STRING, value BINARY)`` committed
through :func:`~lambda_sample_spark.sources.warehouse.merge_versioned`.
``hset`` is then a bounded-work keyed upsert — only the buckets the
updated (hkey, field) pairs land in are rewritten, untouched buckets
are carried forward by hardlink — and the atomic ``_VERSION`` pointer
swap gives every reader a consistent point-in-time snapshot (the
property Redis gets from single-threaded command execution). Unlike a
Redis instance, the value column lives in distributed storage, so the
"hash" can hold 100 TB of model blobs without a single-node RAM cap.

Point reads (``hget``) prune to ONE bucket directory: the store
recomputes the same ``xxhash64 % n_buckets`` the merge used and pushes
it as a partition filter, so a lookup reads ~1/n of the table
regardless of total size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .warehouse import merge_versioned, read_versioned, resolve_buckets

KV_KEYS = ["hkey", "field"]


def hset_df(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    n_buckets: int | None = None,
) -> int:
    """Distributed HSET: every row of ``updates`` (columns ``hkey``,
    ``field``, ``value BINARY``) replaces the current value of its
    (hkey, field) slot. Returns the committed version."""
    updates = updates.select(
        F.col("hkey").cast("string"),
        F.col("field").cast("string"),
        F.col("value").cast("binary"),
    )
    return merge_versioned(spark, root, updates, KV_KEYS, n_buckets=n_buckets)


def hset(
    spark: SparkSession,
    root: str,
    hkey: str,
    mapping: dict[str, bytes],
    n_buckets: int | None = None,
) -> int:
    """Driver-side HSET of a small field->bytes mapping (the reference's
    per-sensor ``hset`` calls). For bulk writes use :func:`hset_df`."""
    rows = [(hkey, f, bytes(v)) for f, v in mapping.items()]
    df = spark.createDataFrame(rows, "hkey string, field string, value binary")
    return hset_df(spark, root, df, n_buckets=n_buckets)


def hget(
    spark: SparkSession,
    root: str,
    hkey: str,
    field: str,
    n_buckets: int | None = None,
) -> bytes | None:
    """Point lookup of one field. Prunes the scan to the single bucket
    directory that can hold (hkey, field). The bucket count comes from
    the table's persisted ``_BUCKETS`` metadata — a stale caller-side
    constant can no longer aim the pruning at the wrong directory (an
    explicit conflicting argument raises)."""
    n_buckets = resolve_buckets(root, n_buckets)
    df = read_versioned(spark, root)
    bkt = F.pmod(F.xxhash64(F.lit(hkey), F.lit(field)), F.lit(n_buckets)).cast(
        "int"
    )
    rows = (
        df.where(F.col("_bkt") == bkt)
        .where((F.col("hkey") == hkey) & (F.col("field") == field))
        .select("value")
        .collect()
    )
    return bytes(rows[0].value) if rows else None


def hgetall(spark: SparkSession, root: str, hkey: str) -> dict[str, bytes]:
    """All fields of one hash key as a driver-side dict (the reference
    reads the whole models/snapshot hash at analysis time). Fields of
    one hash are spread across ALL buckets by design — a huge hash
    reads in parallel instead of hot-spotting one directory."""
    rows = (
        read_versioned(spark, root)
        .where(F.col("hkey") == hkey)
        .select("field", "value")
        .collect()
    )
    return {r.field: bytes(r.value) for r in rows}


def hash_df(spark: SparkSession, root: str, hkey: str) -> DataFrame:
    """The hash as a DataFrame (field, value) — the distributed read
    path for joins against the KV state (S11 at scale: never collect)."""
    return (
        read_versioned(spark, root)
        .where(F.col("hkey") == hkey)
        .select("field", "value")
    )


def foreach_batch_hset(
    root: str,
    hkey_col: str = "hkey",
    field_col: str = "field",
    value_col: str = "value",
    order_col: str | None = None,
    n_buckets: int | None = None,
):
    """S10 as a streaming sink: ``writeStream.foreachBatch(...)`` body
    that HSETs every micro-batch row. Within a batch the newest row per
    (hkey, field) wins (``order_col`` descending when given, matching
    the last-write-wins the reference gets from sequential hset calls);
    across batches merge_versioned's upsert gives the same LWW.

    WITHOUT ``order_col`` a batch has no arrival order Spark can see,
    so true LWW is unexpressible; intra-batch duplicates then resolve
    by the DETERMINISTIC tiebreak max(value-as-string) — reproducible
    across runs and cluster layouts, unlike dropDuplicates' arbitrary
    pick, but NOT last-write: supply order_col (an event ts, a Kafka
    offset) whenever per-batch write order matters."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        df = batch_df.select(
            F.col(hkey_col).alias("hkey"),
            F.col(field_col).alias("field"),
            F.col(value_col).alias("value"),
            *([F.col(order_col).alias("_ord")] if order_col else []),
        )
        if order_col:
            order = F.col("_ord").desc()
        else:
            order = F.col("value").cast("string").desc_nulls_last()
        w = Window.partitionBy("hkey", "field").orderBy(order)
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", *(["_ord"] if order_col else []))
        )
        spark = batch_df.sparkSession
        hset_df(spark, root, df, n_buckets=n_buckets)

    return write


def write_models_kv(
    spark: SparkSession,
    root: str,
    models_df: DataFrame,
    key_col: str = "event_type",
    hkey: str = "model",
) -> int:
    """Trainer.scala:46 shape: one hash field per model key, value =
    the serialized model. Input is the per-bin histogram-model frame
    (ml/forest.train_per_key_pandas — one row per (key, bin)); each
    key's bins are assembled and JSON-encoded executor-side into one
    blob, so model bytes never pass through the driver."""
    others = [c for c in models_df.columns if c != key_col]
    blob = models_df.groupBy(key_col).agg(
        F.to_json(
            F.sort_array(F.collect_list(F.struct(*others)))
        ).alias("payload")
    )
    updates = blob.select(
        F.lit(hkey).alias("hkey"),
        F.col(key_col).alias("field"),
        F.col("payload").cast("binary").alias("value"),
    )
    return hset_df(spark, root, updates)


def write_snapshot_kv(
    spark: SparkSession,
    root: str,
    snap_df: DataFrame,
    hkey: str = "snapshot",
    field_col: str = "sensor",
) -> int:
    """HistoryWriter.scala:72 shape: one hash field per sensor, value =
    the JSON-encoded snapshot row (the reference stores the serialized
    analysis blob). Encoding happens executor-side (to_json, codegen),
    not on the driver."""
    payload = F.to_json(
        F.struct(*[c for c in snap_df.columns if c != field_col])
    )
    updates = snap_df.select(
        F.lit(hkey).alias("hkey"),
        F.col(field_col).alias("field"),
        payload.cast("binary").alias("value"),
    )
    return hset_df(spark, root, updates)
