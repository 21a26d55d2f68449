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

Default baseline (round-12 verdict task #1 — the cross-round fix):
the committed file of the SAME name AT THE ROUND BOUNDARY — the
commit that last touched the newest ``BENCH_r{N}.json`` (the driver's
round-start commit), NOT ``HEAD:``. Round 12 committed its sweep
mid-round, so the end-of-round gate compared r12-to-r12 and reported
"0 regressions" while 20 queries were >1.3x slower than r11; pinning
the baseline to the round boundary makes mid-round commits unable to
move the goalposts. Falls back to ``HEAD:`` when the file does not
exist at the boundary commit (first sweep of a new detail name).

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


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args],
        capture_output=True,
        text=True,
        check=True,
    ).stdout


def round_boundary_ref() -> str:
    """The commit that last touched the newest BENCH_r{N}.json — the
    driver's round-start commit. Everything committed before it is
    previous-round state; a sweep committed after it (this round) must
    not become its own baseline."""
    rounds = sorted(
        REPO.glob("BENCH_r*.json"), key=lambda p: int(p.stem[7:])
    )
    if not rounds:
        return "HEAD"
    ref = _git("log", "-n1", "--format=%H", "--", rounds[-1].name).strip()
    return ref or "HEAD"


def load_old(path: str | None, new_path: str) -> tuple[dict, str]:
    if path:
        with open(path) as f:
            return json.load(f), path
    name = Path(new_path).name
    ref = round_boundary_ref()
    try:
        blob = _git("show", f"{ref}:{name}")
    except subprocess.CalledProcessError:
        ref = "HEAD"  # file did not exist at the boundary commit
        blob = _git("show", f"HEAD:{name}")
    return json.loads(blob), f"{ref[:12]}:{name}"


def main() -> int:
    new_path = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "bench_detail.json")
    new = load_new(new_path)
    old, baseline = load_old(
        sys.argv[2] if len(sys.argv) > 2 else None, new_path
    )
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
        "baseline": baseline,
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
