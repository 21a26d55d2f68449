"""JSON decode/encode + regex field extraction (SURVEY.md §2.1/2.2).

Reference citations (/root/reference/):
  S4  bytes->struct decode   mqtt/Consumer.scala:53-57 (payloads are
      JSON despite the Smile import — BinarySerializer.scala:41-44)
  S12 result JSON encode     lib/JsonSerializer.scala:13-15
  P13 regex extract          dashboard/Dashboard.scala:31,96-102
  P14 scalar unit conversion Dashboard.scala:99

All pure built-in expressions (from_json / to_json / regexp_extract)
— JVM-side, codegen'd, no Python on the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from .common_sources import events

PROPS_SCHEMA = StructType([StructField("k", IntegerType())])


def json_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 + S12 + P13/P14 in one narrow projection over the same scan:

    - ``k``: bytes->struct decode of the JSON props payload
      (``from_json``, the Consumer.scala:53-57 ingest decode);
    - ``js``: struct re-encoded to a compact JSON string with a fixed
      field order (the Jackson field-order fidelity point — SURVEY.md
      §7 hard part 5);
    - ``k_scaled``: regex field extraction + x1000 unit conversion
      (the hey-CSV response-time parsing path, Dashboard.scala:96-102).

    All three are codegen'd JVM expressions; fusing them costs nothing
    (one scan, zero shuffles) and proves each codec direction against
    the oracle."""
    df = events(spark, sf_dir)
    k_re = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("int")
    return df.select(
        "event_id",
        F.from_json(F.col("props"), PROPS_SCHEMA).getField("k").alias("k"),
        F.to_json(F.struct("event_id", "event_type")).alias("js"),
        # widen BEFORE multiplying: int k * int 1000 wraps silently in
        # 32-bit (non-ANSI) past ~2.1M while the oracle's BIGINT math
        # doesn't — cast first so both engines compute the same value
        (k_re.cast("bigint") * F.lit(1000)).alias("k_scaled"),
    )


def variant_decode(df: DataFrame) -> DataFrame:
    """S4, schema-on-read form: ``parse_json`` into Spark 4's VARIANT
    type + ``variant_get`` path extraction — the semi-structured path
    when the payload schema isn't fixed (from_json with an explicit
    struct, above, stays the typed fast path). VARIANT keeps the
    parsed tree in a compact binary encoding, so repeated path
    extraction skips re-parsing the JSON text."""
    v = F.parse_json(F.col("props"))
    return df.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
    )


META_FIELDS = ["name", "ts", "fast_anomaly", "full_anomaly", "avg_anomaly"]


def all_meta_json(meta_df: DataFrame) -> str:
    """S12: serialize an analysis result frame into the reference's
    ``AllMeta`` JSON envelope with Jackson's field order
    (Analyzer.scala:24-32; golden shape ``{"entries":[]}`` —
    EndpointSpec.scala:42). Field order is fixed by the explicit
    struct; an empty frame serializes to exactly ``{"entries":[]}``.

    This is the one deliberate driver-side materialization in the
    engine: it is the HTTP response edge, sized by the sensor fleet
    (rows = #sensors), not by the data.
    """
    # array_sort the collected structs (lexicographic by field order,
    # i.e. by name first): collect_list alone inherits partition
    # scheduling order after the upstream per-sensor shuffle, so two
    # runs over identical data could emit entries in different orders
    # — the nondeterminism render_sensor_list already sorts away
    row = (
        meta_df.select(F.struct(*META_FIELDS).alias("s"))
        .agg(F.array_sort(F.collect_list("s")).alias("entries"))
        .select(F.to_json(F.struct("entries")).alias("js"))
        .first()
    )
    return row["js"]


ORACLE = {
    "q_json_codec": """
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(to_json({'event_id': event_id, 'event_type': event_type}) AS VARCHAR) AS js,
       TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) * 1000 AS k_scaled
FROM events
""",
    # oracle notes: TRY_CAST (not CAST) so a malformed payload yields
    # NULL like Spark's from_json instead of erroring the whole oracle
    # query; on a QUOTED number ('{"k": "12"}') the engines still
    # differ (from_json: NULL; json_extract_string: '12') — Spark's
    # typed semantics are normative, the generated corpus well-formed
}

QUERIES = {
    "q_json_codec": json_codec,
}
