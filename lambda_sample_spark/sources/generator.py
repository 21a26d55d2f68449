"""Synthetic sensor-fleet generator (SURVEY.md §2.1 S1, §2.2 P10).

Reference: mqtt/Producer.scala:55-74 — every tick, each sensor draws
``sign * rand(0, bound)`` in the normal regime or
``sign * (bound + rand(0, bound/2))`` in the anomaly regime
(bound=100, application.conf:5) and labels the row.

Batch formulation: ``spark.range`` + seeded ``rand()`` — fully
distributed, no driver loop; the streaming twin (rate source) lives in
streaming/pipeline.py. Contract: rows-only (randomness is seeded but
engine-specific, so no DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SENSORS = ["Warehouse 13", "The Forsaken Inn", "Old Mill", "Motel 6"]
BOUND = 100
ANOMALY_RATE = 0.034  # fixture-measured rate (FIXTURES.md)


def gen_regimes(
    spark: SparkSession,
    n_per_sensor: int = 1000,
    seed: int = 42,
) -> DataFrame:
    n_sensors = len(SENSORS)
    sensors = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SENSORS)], "sid INT, sensor STRING"
    )
    base = (
        spark.range(n_per_sensor * n_sensors)
        .withColumn("sid", (F.col("id") % n_sensors).cast("int"))
        .withColumn("tick", (F.col("id") / n_sensors).cast("bigint"))
    )
    df = base.join(F.broadcast(sensors), "sid")
    anomaly = (F.rand(seed) < ANOMALY_RATE).cast("int")
    sign = F.when(F.rand(seed + 1) < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    normal_mag = F.floor(F.rand(seed + 2) * BOUND)
    anomal_mag = BOUND + F.floor(F.rand(seed + 3) * (BOUND // 2))
    value = sign * F.when(anomaly == 1, anomal_mag).otherwise(normal_mag)
    return df.select(
        "sensor",
        "tick",
        value.cast("double").alias("value"),
        anomaly.alias("anomaly"),
    )


def q_gen_regimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gen_regimes(spark)


SENSOR_ROW_TEMPLATE = (
    '<div class="form-row form-inline mt-2"><span class="col">%s</span>'
    '<input type="radio" %s name="%s" value="normal">'
    '<input type="radio" %s name="%s" value="anomaly"></div>'
)


def render_sensor_list(fleet: DataFrame) -> str:
    """P15: the producer UI's sensor-list render (Producer.scala:95-99;
    ST4 template resources/producer/index.html:18-31) as a
    ``format_string`` projection — each (sensor, is_normal) row becomes
    one form-row with the matching radio pre-checked, concatenated in
    sensor order. Serving-edge: output is one HTML fragment, sized by
    the fleet, so the single collect is bounded by #sensors."""
    checked_n = F.when(F.col("is_normal"), F.lit("checked")).otherwise(F.lit(""))
    checked_a = F.when(F.col("is_normal"), F.lit("")).otherwise(F.lit("checked"))
    rows = fleet.select(
        F.col("sensor"),
        F.format_string(
            SENSOR_ROW_TEMPLATE,
            F.col("sensor"),
            checked_n,
            F.col("sensor"),
            checked_a,
            F.col("sensor"),
        ).alias("html"),
    )
    # deterministic order: sort inside the aggregate, not via orderBy
    # (collect_list order after an exchange is not guaranteed)
    out = rows.agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(sensor, html))), x -> x.html)"),
            "\n",
        ).alias("doc")
    )
    return out.first()["doc"]


ORACLE: dict[str, str] = {}  # rows-only: seeded randomness is engine-specific

QUERIES = {"q_gen_regimes": q_gen_regimes}
