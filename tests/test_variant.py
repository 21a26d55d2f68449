"""VARIANT (schema-on-read) decode agrees with the typed from_json
path (sources/json_codec.py variant_decode)."""

from __future__ import annotations

from lambda_sample_spark.sources.common_sources import events
from lambda_sample_spark.sources.json_codec import json_codec, variant_decode


def test_variant_equals_typed_decode(spark, sf_dir):
    ev = events(spark, sf_dir)
    via_variant = variant_decode(ev)
    via_struct = json_codec(spark, sf_dir).select("event_id", "k")
    assert via_variant.count() == via_struct.count()
    assert via_variant.exceptAll(via_struct).count() == 0
    assert via_struct.exceptAll(via_variant).count() == 0
