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


def _tracked_bench_files() -> list[str]:
    """Git-TRACKED BENCH_r*.json names, oldest to newest. Tracked-only
    matters: the driver can drop BENCH_r{N}.json in the working tree
    before anything commits it, and globbing the filesystem would then
    `git log` an untracked name, get nothing, and silently fall back
    to HEAD — reintroducing the mid-round self-baseline bug this
    function exists to prevent (round-13 ADVICE)."""
    names = [
        n
        for n in _git("ls-files", "BENCH_r*.json").splitlines()
        if n.strip()
    ]
    return sorted(names, key=lambda n: int(Path(n).stem[7:]))


def round_boundary_ref(back: int = 0) -> str:
    """The commit that last touched the newest tracked BENCH_r{N}.json
    — the driver's round-start commit (``back=1``: the previous
    round's boundary). Everything committed before it is
    previous-round state; a sweep committed after it (this round) must
    not become its own baseline. Walks newest-to-oldest until git log
    yields a commit, so a tracked-but-unborn name can't strand us."""
    names = _tracked_bench_files()
    if back:
        names = names[: -back] if len(names) > back else []
    for name in reversed(names):
        ref = _git("log", "-n1", "--format=%H", "--", name).strip()
        if ref:
            return ref
    return "HEAD"


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


DRIVER_DIVERGE_RATIO = 1.3  # verdict-14 task 3 annotation threshold


def driver_divergence(new: dict) -> dict:
    """Diff the DRIVER's own committed sweeps round-over-round: the
    bench_detail.json blob at this round's boundary commit (the file
    the driver overwrites and commits at round start) against the
    blob at the previous round's boundary. The builder's cross-round
    gate otherwise only ever diffs its OWN committed artifact, so a
    regression visible only in driver runs would never trip anything
    (the round-13 sketch_ml divergence went unadjudicated for exactly
    this reason). Rows where the driver moved >1.3x are annotated
    with the builder's fresh number for the same row, so noise
    (driver moved, builder parity) separates from code (both moved).
    Informational — exit status stays governed by the builder diff;
    driver runs carry the documented exogenous host noise."""
    ref_now = round_boundary_ref()
    ref_prev = round_boundary_ref(back=1)
    if ref_prev in ("HEAD", ref_now):
        return {"note": "no previous-round boundary commit"}
    try:
        d_now = json.loads(_git("show", f"{ref_now}:bench_detail.json"))
        d_prev = json.loads(_git("show", f"{ref_prev}:bench_detail.json"))
        qn, qp = d_now["queries"], d_prev["queries"]
    except (subprocess.CalledProcessError, json.JSONDecodeError, KeyError) as e:
        # informational feature: a missing/corrupt/shapeless boundary
        # blob must not fail the gate (exit status is governed solely
        # by the builder diff)
        return {
            "note": "bench_detail.json unusable at a boundary commit: "
            f"{type(e).__name__}"
        }
    qb = new.get("queries", {})
    rows = {}
    for name in sorted(set(qn) & set(qp)):
        a, b = qp[name], qn[name]
        if min(a, b) < ABS_FLOOR_SEC or max(a, b) <= min(a, b) * DRIVER_DIVERGE_RATIO:
            continue
        entry = {
            "driver_prev": a,
            "driver_now": b,
            "driver_ratio": round(b / a, 2),
        }
        if name in qb:
            entry["builder_now"] = qb[name]
            entry["driver_vs_builder"] = round(b / qb[name], 2)
        rows[name] = entry
    return {
        "driver_now": ref_now[:12],
        "driver_prev": ref_prev[:12],
        "rows": rows,
    }


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
        "driver_diff": driver_divergence(new),
        "ok": not regressions,
    }
    print(json.dumps(verdict))
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
