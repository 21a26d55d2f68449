"""Map a git diff to the contract rows it can affect (round-11
verdict task #8 — the oracle-cost diet's row selector).

Row ownership is derived from the registration site, never a
hand-maintained table: each contract row is registered in exactly one
module's QUERIES / QUERIES_TAIL / ORACLE dict, so a changed module
selects exactly its rows. Any change OUTSIDE the per-row operator
modules but INSIDE the engine package (common.py, io.py, functions/,
session.py, contract.py, streaming/, sources shared by many rows...)
conservatively selects EVERYTHING — a shared-helper edit can move any
row, and a selector that guesses smaller than that is how a stale
artifact gets trusted.

Usage:
  python scripts/changed_rows.py [git-ref]     # default HEAD
prints one row name per line, or the sentinel ALL. Importable:
``rows_for_diff(ref) -> set[str] | None`` (None = run everything).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _module_rows() -> dict[str, set[str]]:
    """repo-relative module path -> rows registered there."""
    from lambda_sample_spark import contract

    out: dict[str, set[str]] = {}
    for m in contract._MODULES:
        rel = str(Path(m.__file__).resolve().relative_to(REPO))
        rows = set(getattr(m, "QUERIES", {}))
        rows |= set(getattr(m, "QUERIES_TAIL", {}))
        rows |= set(getattr(m, "ORACLE", {}))
        out[rel] = rows
    return out


def changed_files(ref: str = "HEAD") -> list[str]:
    """Working-tree changes vs ``ref`` (staged + unstaged + untracked
    .py files — the states a mid-round edit can be in)."""
    diff = subprocess.run(
        ["git", "-C", str(REPO), "diff", "--name-only", ref],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    untracked = subprocess.run(
        ["git", "-C", str(REPO), "ls-files", "--others", "--exclude-standard"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    return sorted(set(diff) | set(untracked))


def rows_for_diff(ref: str = "HEAD") -> set[str] | None:
    """Rows a diff vs ``ref`` can affect; None means 'run everything'
    (a shared/engine file changed, or the entry shim itself)."""
    owned = _module_rows()
    rows: set[str] = set()
    for f in changed_files(ref):
        if f in owned:
            rows |= owned[f]
        elif f == "__spark_entry__.py" or (
            f.startswith("lambda_sample_spark/") and f.endswith(".py")
        ):
            return None  # shared engine code: conservative full gate
        # tests/, docs/, scripts/, artifacts: affect no contract row
    return rows


def main() -> int:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    rows = rows_for_diff(ref)
    if rows is None:
        print("ALL")
    else:
        for r in sorted(rows):
            print(r)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
