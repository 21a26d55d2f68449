"""The serving layer: the reference's flagship ``GET /`` query
(SURVEY.md §3.1) as one DataFrame composition over the streaming entry
store — speed layer (heuristic over newest-200) ⋈ batch layer (per-
sensor RandomForest) → weighted ensemble → ``AllMeta`` JSON envelope.

Reference lifecycle being reproduced (/root/reference/):
  per-sensor fan-out          analyzer/Analyzer.scala:104-115
  heuristic score             Analyzer.scala:47-59
  model posterior             Analyzer.scala:72-83
  blend + absent-model path   Analyzer.scala:143-150 (fullAnomaly = -1
                              sentinel when no model)
  result envelope             Analyzer.scala:24-32; JSON via
                              lib/JsonSerializer.scala:13-15

Spark shape: one window+agg over the store, a broadcast left join of
the (tiny) model-score dimension, pure column expressions for the
blend — the whole "query" is a single plan; serving under load is
reading its cached result (T7 /stress semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scoring import heuristic_score, weighted_ensemble
from .pipeline import lww_entries

NO_MODEL_SENTINEL = -1.0  # Analyzer.scala:148


def speed_layer_agg(entries: DataFrame, recent_n: int = 200) -> DataFrame:
    """Newest-N window stats per sensor: avg, population sd, latest."""
    w = Window.partitionBy("sensor").orderBy(F.col("ts").desc(), F.col("value"))
    recent = entries.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= recent_n
    )
    return recent.groupBy("sensor").agg(
        F.avg("value").alias("avg_value"),
        F.stddev_pop("value").alias("sd_value"),
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("latest_value"),
        F.max("ts").alias("ts"),
    )


def snapshot_from_agg(agg: DataFrame) -> DataFrame:
    """The fast-analysis projection over a speed-layer aggregate:
    (sensor, ts, fast_anomaly, avg_anomaly). Shared by the serving
    query's speed leg AND pipeline.refresh_snapshot — ONE definition
    of the heuristic select, so the snapshot table and the live query
    cannot drift."""
    return agg.select(
        "sensor",
        "ts",
        heuristic_score(
            F.col("latest_value"), F.col("avg_value"), F.col("sd_value")
        ).alias("fast_anomaly"),
        F.col("avg_value").alias("avg_anomaly"),
    )


def speed_snapshot(entries: DataFrame, recent_n: int = 200) -> DataFrame:
    """speed_layer_agg + snapshot_from_agg in one call (the refresh
    path's whole recompute)."""
    return snapshot_from_agg(speed_layer_agg(entries, recent_n))


def model_scores(spark: SparkSession, models: dict, agg: DataFrame) -> DataFrame:
    """Batch-layer posterior P(anomaly) of each sensor's LATEST value
    under its trained forest — the tiny broadcastable dimension.

    Fully lazy: each model's ``transform`` is applied to the probe
    frame filtered to its own sensor and the branches are unioned, so
    the whole dimension evaluates inside the ONE job that materializes
    the serving query — no driver-side collect, no per-sensor Spark
    job. The loop is over the model registry (driver metadata, bounded
    by the fleet size), never over data; the many-keys twin is
    ``ml.forest.train_per_key_pandas`` whose scorer is itself a
    DataFrame."""
    from functools import reduce

    from ..ml.forest import predict_posterior

    if not models:
        return spark.createDataFrame([], "sensor STRING, full_anomaly DOUBLE")
    probes = agg.select("sensor", F.col("latest_value").alias("value"))
    branches = [
        predict_posterior(model, probes.where(F.col("sensor") == sensor)).select(
            "sensor", F.col("p_anomaly").alias("full_anomaly")
        )
        for sensor, model in sorted(models.items())
    ]
    return reduce(DataFrame.unionByName, branches)


def serve_analysis(
    spark: SparkSession,
    entry_dir: str,
    models: dict | None = None,
    recent_n: int = 200,
) -> DataFrame:
    """The flagship composition: SensorMeta rows
    (name, ts, fast_anomaly, full_anomaly, avg_anomaly)."""
    agg = speed_layer_agg(lww_entries(spark, entry_dir), recent_n)
    fast = snapshot_from_agg(agg)
    dim = model_scores(spark, models or {}, agg)
    joined = fast.join(F.broadcast(dim), on="sensor", how="left")
    return joined.select(
        F.col("sensor").alias("name"),
        F.unix_millis("ts").alias("ts"),
        F.round("fast_anomaly", 6).alias("fast_anomaly"),
        F.round(
            F.coalesce(F.col("full_anomaly"), F.lit(NO_MODEL_SENTINEL)), 6
        ).alias("full_anomaly"),
        F.round(
            weighted_ensemble(F.col("fast_anomaly"), F.col("full_anomaly")), 6
        ).alias("avg_anomaly"),
    )


def serve_json(spark: SparkSession, entry_dir: str, models: dict | None = None) -> str:
    """``GET /`` end to end: analysis → AllMeta JSON envelope."""
    from ..sources.json_codec import all_meta_json

    return all_meta_json(serve_analysis(spark, entry_dir, models))
