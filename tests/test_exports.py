"""S9 CSV export round-trip + P15 sensor-list render."""

from __future__ import annotations

from pyspark.sql import functions as F

from lambda_sample_spark.sources.csv_source import (
    export_entries_csv,
    read_entries_csv,
)
from lambda_sample_spark.sources.generator import render_sensor_list


def test_csv_export_roundtrip(spark, tmp_path):
    # S9 (README.md:163): export the entry store, read it back with the
    # S8 scan, get identical rows
    src = read_entries_csv(spark)
    out = str(tmp_path / "list_csv")
    export_entries_csv(src, out)
    back = read_entries_csv(spark, out)
    assert back.count() == src.count()
    assert back.schema == src.schema
    assert src.exceptAll(back).count() == 0
    assert back.exceptAll(src).count() == 0


def test_render_sensor_list(spark):
    # P15 (Producer.scala:95-99; resources/producer/index.html:18-31)
    fleet = spark.createDataFrame(
        [("Old Mill", True), ("Motel 6", False)],
        "sensor STRING, is_normal BOOLEAN",
    )
    html = render_sensor_list(fleet)
    rows = html.split("\n")
    assert len(rows) == 2
    # sorted by sensor: Motel 6 first, anomaly radio checked
    assert rows[0].startswith('<div class="form-row form-inline mt-2"><span class="col">Motel 6</span>')
    assert 'checked name="Motel 6" value="anomaly"' in rows[0]
    assert ' name="Motel 6" value="normal"' in rows[0]
    assert 'checked name="Old Mill" value="normal"' in rows[1]
