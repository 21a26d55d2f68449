"""Correlated-subquery TPC-H shapes (Q2/Q21), DuckDB-oracle-checked at
the same rigor as the contract gate (library ops — the 50 contract
slots are full)."""

from __future__ import annotations

import pytest

from lambda_sample_spark.operators.tpch import tpch_q2_shape, tpch_q21_shape
from tests.oracle_harness import duckdb_con

Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT c.l_partkey AS partkey, s.s_name AS supplier, round(c.cost, 2) AS cost
FROM cost c
JOIN supplier s ON c.l_suppkey = s.s_suppkey
WHERE c.cost = (SELECT min(c2.cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey)
"""

Q21_SQL = """
WITH flagged AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM flagged WHERE late
), supps AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM flagged
)
SELECT a.l_suppkey, count(*) AS numwait
FROM late a
WHERE EXISTS (SELECT 1 FROM supps b
              WHERE b.l_orderkey = a.l_orderkey AND b.l_suppkey != a.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late c
                  WHERE c.l_orderkey = a.l_orderkey AND c.l_suppkey != a.l_suppkey)
GROUP BY a.l_suppkey
"""


@pytest.mark.parametrize(
    "fn,sql",
    [(tpch_q2_shape, Q2_SQL), (tpch_q21_shape, Q21_SQL)],
    ids=["q2_shape", "q21_shape"],
)
def test_shape_matches_duckdb(spark, sf_dir, fn, sql):
    got = fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    try:
        want = con.execute(sql).fetchdf()
    finally:
        con.close()
    assert len(got) == len(want) and len(got) > 0
    srt = lambda d: (
        d[sorted(d.columns)].sort_values(by=sorted(d.columns)).reset_index(drop=True)
    )
    a, b = srt(got), srt(want)
    assert a.equals(b.astype(a.dtypes.to_dict()))


Q4_SQL = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_extendedprice > 1500.0)
GROUP BY o.o_orderpriority
"""

Q19_SQL = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 40
       AND l.l_quantity BETWEEN 20 AND 50)
"""


@pytest.mark.parametrize(
    "fn_name,sql",
    [("tpch_q4_shape", Q4_SQL), ("tpch_q19_shape", Q19_SQL)],
    ids=["q4_shape", "q19_shape"],
)
def test_round7_shapes_match_duckdb(spark, sf_dir, fn_name, sql):
    from lambda_sample_spark.operators import tpch

    got = getattr(tpch, fn_name)(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    try:
        want = con.execute(sql).fetchdf()
    finally:
        con.close()
    assert len(got) == len(want) and len(got) > 0
    srt = lambda d: (
        d[sorted(d.columns)].sort_values(by=sorted(d.columns)).reset_index(drop=True)
    )
    a, b = srt(got), srt(want)
    assert a.equals(b.astype(a.dtypes.to_dict()))
