"""Vector column expressions over ``array<float>`` embeddings.

Built-in higher-order functions only (zip_with / aggregate) — the dot
product and norms run inside codegen on the JVM; no Python UDF, no
VectorUDT conversion. Elements are cast to double before accumulation
so results are bit-identical with DuckDB's double-precision list ops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    """Native array cast, not transform(x -> cast(x)): Cast of
    array<float> to array<double> is a codegen expression while the
    higher-order transform is interpreted per element (round-16, guide
    §4.1). Bit-identical — both widen each float32 exactly."""
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
