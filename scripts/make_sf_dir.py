"""Materialize an sf1-equivalent testdata directory (round-11 verdict
task #1: run the FULL contract gate at sf1, one decade past sf0.1 —
every decade so far has surfaced a new float/representation seam).

Inflates /root/testdata/sf0.1 by ``factor`` (default 10) with the same
JOIN-CONSISTENT key remapping as scripts/scale_oneoff.run_sf1_rung —
every copy c rewrites fact AND dim keys as key*factor + c so
referential integrity and join fan-outs match a real larger scale
factor — plus schema-faithful documents/embeddings recipes ported from
tests/test_scale_stress (_inflate_docs / the perturbed-embedding rung):
copy 0 is the untouched original, the other copies mix near-duplicate,
long-block and far texts so dedup/similarity operators see realistic
neighborhoods instead of 10x exact clones.

DuckDB does the writes (not Spark): single <table>.parquet files like
the driver's own layout, naive micros timestamps (what both engines
present for the TIMESTAMP_NANOS originals), and no Spark session is
consumed. The output dir is a drop-in ``sf_dir`` for ``queries()`` /
``oracle_sql()`` / scripts/correctness_local.py / bench.py.

Usage:  python scripts/make_sf_dir.py <outdir> [factor]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

SRC = "/root/testdata/sf0.1"
ID_OFF = 10_000_000  # documents/embeddings id offset (test_scale_stress)


def copies_cte(factor: int) -> str:
    return f"(SELECT unnest(range({factor})) AS k)"


def inflate_keyed(con, out: str, factor: int, name: str, keyed: list[str], cols: list[str]):
    """Cross-join with the copy range; remap ``keyed`` columns to
    key*factor + k, pass the rest through unchanged."""
    sel = ", ".join(
        f"{c} * {factor} + k AS {c}" if c in keyed else c for c in cols
    )
    q = (
        f"COPY (SELECT {sel} FROM '{SRC}/{name}.parquet' "
        f"CROSS JOIN {copies_cte(factor)} ORDER BY k) "
        f"TO '{out}/{name}.parquet' (FORMAT PARQUET)"
    )
    t0 = time.perf_counter()
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM '{out}/{name}.parquet'").fetchone()[0]
    print(f"{name}: {n} rows in {time.perf_counter() - t0:.1f}s", flush=True)


def copy_dim(con, out: str, name: str):
    con.execute(
        f"COPY (SELECT * FROM '{SRC}/{name}.parquet') "
        f"TO '{out}/{name}.parquet' (FORMAT PARQUET)"
    )
    print(f"{name}: copied 1x (fixed dim)", flush=True)


def inflate_documents(con, out: str, factor: int):
    """_inflate_docs ported to SQL: k=0 original, k%8==1 near-dup
    (text + one extra token), k%8 in (2,6) long blocks (35 shared
    tokens per (doc, block) so substring/winnowing find real repeats),
    else far text (24 unique tokens)."""
    block35 = ", ".join(
        f"'L' || doc_id || 'b' || (k // 8) || 'p' || {j}" for j in range(35)
    )
    far24 = ", ".join(f"'u' || doc_id || 'k' || k || 't' || {j}" for j in range(24))
    q = f"""
    COPY (
      WITH inf AS (
        SELECT d.*, c.k,
               CASE
                 WHEN k = 0 THEN text
                 WHEN k % 8 = 1 THEN concat_ws(' ', text, 'near' || k)
                 WHEN k % 8 IN (2, 6)
                   THEN concat_ws(' ', text, {block35}, 'm' || k)
                 ELSE concat_ws(' ', {far24})
               END AS text2
        FROM '{SRC}/documents.parquet' d CROSS JOIN {copies_cte(factor)} c
      )
      SELECT doc_id + k * {ID_OFF} AS doc_id, text2 AS text, lang, source,
             length(text2)::BIGINT AS n_chars
      FROM inf ORDER BY k
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """
    t0 = time.perf_counter()
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM '{out}/documents.parquet'").fetchone()[0]
    print(f"documents: {n} rows in {time.perf_counter() - t0:.1f}s", flush=True)


def inflate_embeddings(con, out: str, factor: int):
    """Copy 0 untouched; copies k>0 get a small deterministic per-copy,
    per-dimension float32 perturbation (so similarity ops see near but
    not exact neighbors — the scale_oneoff semdedup-rung recipe)."""
    q = f"""
    COPY (
      SELECT vec_id + k * {ID_OFF} AS vec_id,
             CASE WHEN k = 0 THEN embedding
                  ELSE list_transform(
                         embedding,
                         (x, i) -> (x + 0.01 * sin(k * 1.7 + i))::FLOAT)
             END AS embedding,
             label
      FROM '{SRC}/embeddings.parquet' CROSS JOIN {copies_cte(factor)}
      ORDER BY k
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """
    t0 = time.perf_counter()
    con.execute(q)
    n = con.execute(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"embeddings: {n} rows in {time.perf_counter() - t0:.1f}s", flush=True)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    inflate_keyed(
        con, out, factor, "orders",
        ["o_orderkey", "o_custkey"],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    )
    inflate_keyed(
        con, out, factor, "lineitem",
        ["l_orderkey", "l_suppkey"],  # l_partkey stays: part is a fixed dim
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
         "l_linestatus", "l_shipdate"],
    )
    inflate_keyed(
        con, out, factor, "customer",
        ["c_custkey"],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    inflate_keyed(
        con, out, factor, "supplier",
        ["s_suppkey"],
        ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    inflate_keyed(
        con, out, factor, "events",
        ["event_id", "user_id"],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    for d in ("region", "nation", "part"):
        copy_dim(con, out, d)
    inflate_documents(con, out, factor)
    inflate_embeddings(con, out, factor)
    print(f"sf dir ready: {out} (factor {factor} over {SRC})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
