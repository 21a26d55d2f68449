"""Synthetic sensor-fleet generator (SURVEY.md §2.1 S1, §2.2 P10).

Reference: mqtt/Producer.scala:55-74 — every tick, each sensor draws
``sign * rand(0, bound)`` in the normal regime or
``sign * (bound + rand(0, bound/2))`` in the anomaly regime
(bound=100, application.conf:5) and labels the row.

Batch formulation: ``spark.range`` + a counter-based PRNG — fully
distributed, no driver loop; the streaming twin (rate source) lives in
streaming/pipeline.py.

Determinism contract: each per-row uniform is a 3-round LCG
(``s -> (1103515245*s + 12345) mod 2^31``, the classic glibc
constants) seeded from ``(seed, id, stream)`` with plain BIGINT
arithmetic — no engine-specific hash or rand(), so DuckDB evaluates
the *identical* expression and the query is fully oracle-checked
(values, not just rows). All intermediate doubles (``s / 2^31``,
``u * BOUND``) are exact in IEEE 754 (<=38 significant bits), so the
two engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SENSORS = ["Warehouse 13", "The Forsaken Inn", "Old Mill", "Motel 6"]
BOUND = 100
ANOMALY_RATE = 0.034  # fixture-measured rate (FIXTURES.md)

LCG_C, LCG_M = 12345, 2**31
# ONE MULTIPLIER PER STREAM — not one shared one. With a shared A the
# whole 3-round map is affine, so two streams whose start states
# differ by a constant stay a CONSTANT apart forever:
# u_{k+1} - u_k = A^3/M (mod 1) for every row, which made "anomaly"
# rows always draw sign = -1 and magnitudes from a 3-value band
# (measured on 40k rows before the fix). Distinct classic multipliers
# make each stream a structurally different map; measured after:
# anomaly sign 49.7% negative, magnitudes covering all 50 values.
_LCG_AS = [
    1103515245,  # glibc
    1566083941,  # Waterman
    69069,  # VAX MTH$RANDOM
    1812433253,  # Knuth/MT initializer
    1664525,  # Numerical Recipes
    22695477,  # Borland C++
    134775813,  # Turbo Pascal
    214013,  # MSVC
]
_N_STREAMS = 8  # id*_N_STREAMS + stream never collides across streams
assert len(_LCG_AS) == _N_STREAMS  # one distinct multiplier per stream


def _uniform(stream: int, seed: int) -> Column:
    """U[0,1) from (seed, id, stream): 3 LCG rounds, exact double."""
    a = _LCG_AS[stream]
    s = F.col("id") * _N_STREAMS + F.lit(stream + seed * 1000003)
    for _ in range(3):
        s = (s * a + LCG_C) % LCG_M
    return s / F.lit(float(LCG_M))


def _uniform_sql(stream: int, seed: int) -> str:
    a = _LCG_AS[stream]
    s = f"(id*{_N_STREAMS} + {stream + seed * 1000003})"
    for _ in range(3):
        s = f"(({s} * {a} + {LCG_C}) % {LCG_M})"
    return f"({s} / {float(LCG_M)})"


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
    anomaly = (_uniform(0, seed) < ANOMALY_RATE).cast("int")
    sign = F.when(_uniform(1, seed) < 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
    normal_mag = F.floor(_uniform(2, seed) * BOUND)
    anomal_mag = BOUND + F.floor(_uniform(3, seed) * (BOUND // 2))
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
    # HTML-escape the name before interpolating into attribute and
    # body positions: a sensor named 'A"><script>' must not terminate
    # the attribute or inject markup (& first, then < > ")
    esc = F.col("sensor")
    for ch, rep in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]:
        esc = F.replace(esc, F.lit(ch), F.lit(rep))
    rows = fleet.select(
        F.col("sensor"),
        F.format_string(
            SENSOR_ROW_TEMPLATE,
            esc,
            checked_n,
            esc,
            checked_a,
            esc,
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


def _gen_regimes_oracle(n_per_sensor: int = 1000, seed: int = 42) -> str:
    n = n_per_sensor * len(SENSORS)
    sensor_case = " ".join(
        f"WHEN {i} THEN '{s.replace(chr(39), chr(39) * 2)}'"
        for i, s in enumerate(SENSORS)
    )
    u0, u1, u2, u3 = (_uniform_sql(k, seed) for k in range(4))
    return f"""
    WITH base AS (SELECT t.range AS id FROM range(0, {n}) t),
    drawn AS (
      SELECT
        CASE id % {len(SENSORS)} {sensor_case} END AS sensor,
        id // {len(SENSORS)} AS tick,
        CAST({u0} < {ANOMALY_RATE} AS INTEGER) AS anomaly,
        CASE WHEN {u1} < 0.5 THEN -1.0 ELSE 1.0 END AS sign,
        FLOOR({u2} * {BOUND}) AS normal_mag,
        {BOUND} + FLOOR({u3} * {BOUND // 2}) AS anomal_mag
      FROM base
    )
    SELECT sensor, tick,
      CAST(sign * (CASE WHEN anomaly = 1 THEN anomal_mag ELSE normal_mag END) AS DOUBLE) AS value,
      anomaly
    FROM drawn
    """


ORACLE: dict[str, str] = {"q_gen_regimes": _gen_regimes_oracle()}

QUERIES = {"q_gen_regimes": q_gen_regimes}
