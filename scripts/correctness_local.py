"""Local replica of the driver's correctness gate over ALL contract
rows (the driver's own artifact only ever shows the frozen first-50
window — VERDICT r9 asked for a committed full-coverage twin).

Drives ``__spark_entry__`` from THIS fresh process with a vanilla
SparkSession (no engine confs — the /verify seam, so cloudpickle
self-containment and the nanos-timestamp shim are exercised), runs
every ``queries()`` row and its DuckDB oracle at sf0.01, and writes
``CORRECTNESS_LOCAL_r{N}.json`` in the driver's per-query format:

    {"rows_match": bool, "schema_match": bool, "hash_match": bool,
     "spark_rows": int, "oracle_rows": int|null, "err": str|null}

``hash_match`` here is computed by the STRICTER cell-exact compare
(tests/oracle_harness.py): if it is true, the driver's value-hash
compare is true a fortiori.

Usage:  python scripts/correctness_local.py <round> [sf_dir] [label]
Writes: CORRECTNESS_LOCAL_{label}r{round:02d}.json at the repo root
(label e.g. "SF1_" for the sf1 sweep; empty = the sf0.01 default).

Mid-round oracle-cost diet (round-11 verdict task #8): set
``SPARK_GRAFT_GATE_CHANGED=<git-ref>`` (e.g. HEAD) to rerun ONLY the
rows whose registering operator module changed vs that ref
(scripts/changed_rows.py — a shared-engine-file change still runs
everything), or ``SPARK_GRAFT_GATE_ONLY=q_a,q_b`` for an explicit
list. Either filter writes ``..._PARTIAL.json`` and NEVER the
committed artifact name: the full gate at round close stays the only
writer of the file the judge reads.
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    label = sys.argv[3] if len(sys.argv) > 3 else ""
    # lazy oracles (q_semantic_dedup refits centroid literals from the
    # parquet) must fit against THIS run's SF, not the driver default
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )

    import __spark_entry__ as entrymod
    from tests.oracle_harness import compare, duckdb_con

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_con(sf_dir)

    partial = False
    only_env = os.environ.get("SPARK_GRAFT_GATE_ONLY")
    changed_ref = os.environ.get("SPARK_GRAFT_GATE_CHANGED")
    if only_env:
        keep = {n.strip() for n in only_env.split(",") if n.strip()}
        unknown = keep - set(queries)
        assert not unknown, f"SPARK_GRAFT_GATE_ONLY unknown rows: {sorted(unknown)}"
        queries = {n: q for n, q in queries.items() if n in keep}
        partial = True
    elif changed_ref:
        from changed_rows import rows_for_diff

        rows = rows_for_diff(changed_ref)
        if rows is None:
            print(
                f"changed-rows vs {changed_ref}: shared engine code "
                f"touched -> full gate"
            )
        else:
            queries = {n: q for n, q in queries.items() if n in rows}
            partial = True
            print(
                f"changed-rows vs {changed_ref}: {len(queries)} rows "
                f"selected: {sorted(queries)}"
            )
            if not queries:
                print("no contract rows affected; nothing to run")
                return 0

    results: dict[str, dict] = {}
    t0 = time.time()
    for i, name in enumerate(queries):
        tq = time.time()
        row: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = queries[name](spark, sf_dir)
            if name not in oracles:
                row["spark_rows"] = sdf.count()
                row["err"] = "no_oracle"
            else:
                odf = con.execute(oracles[name]).fetchdf()
                sp = sdf.toPandas()
                row["spark_rows"] = len(sp)
                row["oracle_rows"] = len(odf)
                row["rows_match"] = len(sp) == len(odf)
                row["schema_match"] = sorted(sp.columns) == sorted(odf.columns)
                # cell-exact (strictly stronger than the driver's hash)
                problems = compare(name, sdf, odf)
                row["hash_match"] = not problems
                if problems:
                    row["err"] = problems[0][:500]
        except Exception as exc:  # noqa: BLE001 — record, keep driving
            row["err"] = f"{type(exc).__name__}: {exc}"[:500]
            traceback.print_exc()
        results[name] = row
        status = (
            "green"
            if row["hash_match"]
            else ("rows-only" if row["err"] == "no_oracle" else "FAIL")
        )
        print(
            f"[{i + 1}/{len(queries)}] {name}: {status} "
            f"({time.time() - tq:.1f}s)",
            flush=True,
        )

    suffix = "_PARTIAL" if partial else ""
    out_path = REPO / f"CORRECTNESS_LOCAL_{label}r{rnd:02d}{suffix}.json"
    out_path.write_text(json.dumps(results, indent=1) + "\n")

    n_green = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_green - n_rows_only
    print(
        f"\n{out_path.name}: {n_green} green, {n_rows_only} rows-only, "
        f"{n_fail} FAIL of {len(results)} in {time.time() - t0:.0f}s"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
