"""Shared loaders for source modules (avoids operators<->sources import
cycles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")
