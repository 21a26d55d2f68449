"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-sensor fast-anomaly analysis
(the reference's ``GET /`` query — SURVEY.md §3.1) at sf0.001.
``queries()`` / ``oracle_sql()`` enumerate every implemented operator
from SURVEY.md §2; implementations live in ``lambda_sample_spark``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from lambda_sample_spark import contract  # noqa: E402
from lambda_sample_spark.operators.anomaly import fast_anomaly  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return fast_anomaly(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
