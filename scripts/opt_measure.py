"""Round-15/16 optimization measurement harness.

For each named contract query: run it end-to-end through the noop sink
(guide §1.4) in a fresh-ish session, record min/median wall seconds
over N repeats, and dump ``.explain("formatted")`` to
``plans/r15/<name>_<tag>.txt`` (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters, BatchEvalPython nodes —
before and after every change).

Usage:
  python scripts/opt_measure.py --names q_a,q_b --tag before \
      [--repeats 3] [--sf-dir /root/testdata/sf0.1] [--no-plans]

Timing methodology matches bench.py (warmup sweep, interleaved
repeats, min-of-N) so numbers are comparable with bench_detail.json.
Composites from bench.py can be named too (their plans are skipped —
they drive their own materialization).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--round", type=int, default=16, help="plans/r{N}/ dump dir")
    ap.add_argument("--out", default=None, help="write the JSON summary here too")
    args = ap.parse_args()
    names = [n.strip() for n in args.names.split(",") if n.strip()]

    import bench as benchmod
    import __spark_entry__ as entrymod
    from lambda_sample_spark.session import get_spark

    queries = entrymod.queries()
    spark = get_spark(app_name=f"opt-measure-r{args.round}")

    plans_dir = Path(REPO) / "plans" / f"r{args.round}"
    plans_dir.mkdir(parents=True, exist_ok=True)

    fns = {}
    for n in names:
        if n in benchmod.COMPOSITES:
            fns[n] = benchmod.COMPOSITES[n]
        else:
            fns[n] = lambda s, d, _q=queries[n]: benchmod.force(_q(s, d))

    # plans first (cheap, lazy) so a slow timing run can't lose them
    if not args.no_plans:
        for n in names:
            if n in benchmod.COMPOSITES:
                continue
            df = queries[n](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (plans_dir / f"{n}_{args.tag}.txt").write_text(plan)

    if args.repeats == 0:  # plans-only capture
        spark.stop()
        print(json.dumps({"tag": args.tag, "plans": len(names)}))
        return

    # warmup sweep (unmeasured), then interleaved repeats, min-of-N
    for n in names:
        spark.sparkContext.setJobDescription(f"warmup {n}")
        fns[n](spark, args.sf_dir)
    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.repeats):
        for n in names:
            spark.sparkContext.setJobDescription(f"measure {n}")
            t0 = time.perf_counter()
            fns[n](spark, args.sf_dir)
            runs[n].append(time.perf_counter() - t0)
    spark.stop()

    out = {
        n: {
            "min": round(min(rs), 4),
            "med": round(sorted(rs)[len(rs) // 2], 4),
            "max": round(max(rs), 4),
        }
        for n, rs in runs.items()
    }
    line = json.dumps({"tag": args.tag, "sf_dir": args.sf_dir, "timings": out})
    print(line)
    if args.out:
        Path(args.out).write_text(line)


if __name__ == "__main__":
    main()
