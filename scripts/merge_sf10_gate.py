"""Assemble the committed sf10 spot-gate artifact (round-11 verdict
task #6) from the two-phase run.

Phase 1 ran float-output rows 1-26 before being stopped (its two
FAILs — q_group_stats, q_tpch_q1 — were fixed in-round and re-run in
phase 2); phase 2 covered the remaining rows plus those two. This
merges: phase-2 JSON wins where present; phase-1 rows are green-only
log entries (a phase-1 row that failed and was NOT re-run would be
refused, keeping the artifact honest).

Exclusions (documented, same class): q_embed_near_dup,
q_winnow_near_dup, q_ngram_jaccard — their DuckDB oracles are
pairwise self-joins whose intermediate grows ~100x sf1's (already
475 s / 147 s / gate-dominating there); the operators' float columns
are oracle-checked at sf0.01/sf0.1/sf1 and their sf10-scale behavior
is covered by the production-twin bench rows instead.

Usage: python scripts/merge_sf10_gate.py <phase1.log> <phase2.json> <out.json>
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# pairwise-self-join oracles, infeasible at factor 100 (docstring above)
SF10_EXCLUDED = {"q_embed_near_dup", "q_winnow_near_dup", "q_ngram_jaccard"}

GREEN = {
    "rows_match": True,
    "schema_match": True,
    "hash_match": True,
    "err": None,
}


def main() -> int:
    log_path, p2_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(p2_path) as f:
        merged: dict[str, dict] = json.load(f)

    pat = re.compile(r"\[\d+/\d+\] (\w+): (green|FAIL|rows-only) \(([\d.]+)s\)")
    with open(log_path) as f:
        for m in pat.finditer(f.read()):
            name, status, _secs = m.groups()
            if name in merged:
                continue  # phase 2 (post-fix) result wins
            assert status == "green", (
                f"{name}: phase-1 {status} was never re-run in phase 2"
            )
            merged[name] = {
                **GREEN,
                "spark_rows": None,  # phase-1 log carries status only
                "oracle_rows": None,
                "note": "phase1-log",
            }

    # coverage check (ADVICE r12): a row missing from BOTH phases must
    # fail the merge, not silently drop — the artifact claims gate
    # coverage of the full contract registry minus the documented
    # pairwise-oracle exclusions.
    import __spark_entry__ as entry_mod

    expected = set(entry_mod.queries()) - SF10_EXCLUDED
    missing = expected - set(merged)
    extra = set(merged) - expected
    # SystemExit, not assert: a gate-enforcing check must survive
    # `python -O` (ADVICE r13)
    if missing:
        raise SystemExit(f"rows missing from both phases: {sorted(missing)}")
    if extra:
        raise SystemExit(f"rows not in the contract registry: {sorted(extra)}")

    fails = [n for n, r in merged.items() if r.get("err") and r["err"] != "no_oracle"]
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"{out_path}: {len(merged)} rows, {len(fails)} FAIL {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
