"""Bench regression gate (round-11 verdict task #5): diff a fresh
bench_detail.json against the previously COMMITTED one and fail on
per-query slowdowns beyond what the run's own sweep spread explains.

A query regresses when new/old > max(1.5, spread_margin) where
spread_margin = the larger run's sweep_spread (max/min wall across
interleaved sweeps — the run's measured host-noise envelope) plus
slack. Sub-100ms rows are exempt: at that scale JVM scheduling noise
dominates and a ratio is meaningless; the absolute ceiling still
catches a 100ms row becoming seconds. New/removed queries are listed,
never failed — coverage growth is not a regression.

Usage:
  python scripts/bench_regression.py [new_detail] [old_detail]
  (defaults: bench_detail.json vs the committed file of the SAME
  name — `git show HEAD:<basename(new_detail)>` — so the sf1 sweep
  gates with `python scripts/bench_regression.py bench_detail_sf1.json`
  against its own committed baseline; round-11 verdict task #3)

Exit 1 on any regression; prints one JSON line either way so the
round routine can commit the verdict alongside the sweep.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RATIO_FLOOR = 1.5  # verdict-specified minimum flag threshold
ABS_FLOOR_SEC = 0.1  # ignore ratio noise under this absolute cost
SPREAD_SLACK = 0.15  # spread is itself a 1-sample estimate


def load_new(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def load_old(path: str | None, new_path: str) -> dict:
    if path:
        with open(path) as f:
            return json.load(f)
    blob = subprocess.run(
        ["git", "-C", str(REPO), "show", f"HEAD:{Path(new_path).name}"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(blob)


def main() -> int:
    new_path = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "bench_detail.json")
    new = load_new(new_path)
    old = load_old(sys.argv[2] if len(sys.argv) > 2 else None, new_path)
    nq, oq = new["queries"], old["queries"]
    threshold = max(
        RATIO_FLOOR,
        max(new.get("sweep_spread", 1.0), old.get("sweep_spread", 1.0))
        + SPREAD_SLACK,
    )
    regressions, improvements = {}, {}
    for name in sorted(set(nq) & set(oq)):
        a, b = oq[name], nq[name]
        if b > max(a * threshold, ABS_FLOOR_SEC):
            regressions[name] = {"old": a, "new": b, "ratio": round(b / a, 2)}
        elif a > max(b * threshold, ABS_FLOOR_SEC):
            improvements[name] = round(b / a, 2)
    verdict = {
        "threshold": round(threshold, 3),
        "common": len(set(nq) & set(oq)),
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "regressions": regressions,
        "improved": len(improvements),
        "ok": not regressions,
    }
    print(json.dumps(verdict))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
