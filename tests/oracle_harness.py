"""Local replica of the driver's correctness gate: run each contract
query on Spark AND its oracle SQL on DuckDB over the same parquet,
then compare row count, column names, and (order-insensitively) values.

Comparison is STRICTER than the driver's value-hash: exact equality on
every cell (floats must match bit-for-bit after the in-query rounding
both sides apply). If this passes, the driver's hash comparison passes.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from lambda_sample_spark.io import TABLES

SQL_TABLES = TABLES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in SQL_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        canon_row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append("<NULL>")
            elif pd.isna(v):
                canon_row.append("<NULL>")
            elif isinstance(v, float):
                canon_row.append(repr(v))
            else:
                canon_row.append(repr(v))
        rows.append(tuple(canon_row))
    return sorted(rows)


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    problems = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"{name}: columns differ spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"{name}: rowcount spark={len(sp)} oracle={len(oracle_df)}")
    a, b = _canon(sp), _canon(oracle_df)
    if a != b:
        # build each side's set ONCE — the old per-element set(b)
        # rebuild made mismatch reporting O(n^2): a 500k-row diff at
        # the sf10 gate would have taken ~7 h to print
        set_a, set_b = set(a), set(b)
        diff_a = [r for r in a if r not in set_b][:3]
        diff_b = [r for r in b if r not in set_a][:3]
        problems.append(
            f"{name}: values differ; spark-only={diff_a} oracle-only={diff_b}"
        )
    return problems
