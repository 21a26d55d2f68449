"""Physical-plan audits (SURVEY.md §4, §7 Phase 6).

The reference leans on its store for pushdown (partition-key lookups,
clustering-order LIMIT); in Spark those physical properties come from
Catalyst. These helpers make the "is the plan the one we want" check
executable — used by tests and by bench reporting:

  - pushed_filters(df): PushedFilters from the parquet scan nodes.
  - read_schema(df): columns actually read (column pruning proof).
  - codegen_spans(df): WholeStageCodegen subtree count.
  - has_broadcast_join / has_partial_agg: strategy assertions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .shim import explain_string, optimized_plan, physical_plan  # noqa: F401


def formatted_plan(df: DataFrame) -> str:
    return explain_string(df, "formatted")


def simple_plan(df: DataFrame) -> str:
    return physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


def scan_read_schemas(df: DataFrame) -> list[tuple[str, str]]:
    """(location, ReadSchema) per scan node, in plan order — lets a
    test assert column pruning PER TABLE when a query scans several
    (round-16, guide §6.2). Location and ReadSchema lines belong to
    the same scan's details block; scans print one Location each."""
    plan = formatted_plan(df)
    out: list[tuple[str, str]] = []
    loc = None
    for line in plan.splitlines():
        m = re.search(r"Location: \w+ \[([^\]]*)\]", line)
        if m:
            loc = m.group(1)
            continue
        m = re.search(r"ReadSchema: (\S+)", line)
        if m and loc is not None:
            out.append((loc, m.group(1)))
            loc = None
    return out


def codegen_span_count(df: DataFrame) -> int:
    """Count WholeStageCodegen spans. Under AQE the plan is only final
    after execution, so force the query through a noop sink first."""
    plan = simple_plan(df)
    if "isFinalPlan=false" in plan:
        # a noop write would execute a different QueryExecution; only
        # an action on THIS frame finalizes its adaptive plan
        df.collect()
        plan = simple_plan(df)
    return plan.count("*(")


_SCAN_NODE = re.compile(r"\b(?:File|Batch)Scan\b")


def scan_count(df_or_plan) -> int:
    """Count scan nodes by whole node name — matches both the DSv1
    `FileScan` and DSv2 `BatchScan` spellings so single-scan pins are
    about scan COUNT, not scan-node spelling (round-16 advice item 3:
    `plan.count("Scan parquet")` silently reads 0 if the source moves
    to a DSv2 reader, and miscounts if the format changes)."""
    plan = df_or_plan if isinstance(df_or_plan, str) else simple_plan(df_or_plan)
    return len(_SCAN_NODE.findall(plan))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_partial_agg(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "HashAggregate" in plan and (
        "partial" in plan.lower() or plan.count("HashAggregate") >= 2
    )


_JOIN_TOKENS = (
    "Inner",
    "LeftOuter",
    "RightOuter",
    "FullOuter",
    "LeftSemi",
    "LeftAnti",
    "Cross",
    "BuildRight",
    "BuildLeft",
)


def normalized_plan(df: DataFrame) -> str:
    """Strategy SKELETON of the physical plan, stable across runs and
    machines: one line per operator keeping only the decision-relevant
    tokens — operator name, exchange partitioning kind, join strategy
    + join type + build side, scan format. Plan ids, paths, column
    lists, and statistics are stripped.

    Complements the Exchange-count budget (test_shuffle_budget): the
    budget catches ADDED shuffles, this catches strategy FLIPS that
    keep the count constant — a broadcast join silently becoming a
    sort-merge join, a lost partial aggregate, an extra sort. Used by
    tests/test_plan_snapshots.py against checked-in snapshots."""
    out = []
    for raw in simple_plan(df).splitlines():
        line = re.sub(r"^[\s:+\-*)(0-9]*", "", raw).strip()
        if not line:
            continue
        name = re.split(r"[\s(]", line, 1)[0].rstrip(",")
        if not name or not name[0].isupper():
            continue
        if name == "Exchange":
            kind = (
                "hash"
                if "hashpartitioning" in line
                else "range"
                if "rangepartitioning" in line
                else "single"
                if "SinglePartition" in line
                else "other"
            )
            out.append(f"Exchange {kind}")
        elif "Join" in name or name == "CartesianProduct":
            toks = [t for t in _JOIN_TOKENS if f" {t}" in f" {line}"]
            out.append(" ".join([name, *toks]))
        elif name == "FileScan":
            parts = line.split()
            fmt = parts[1].split("[")[0] if len(parts) > 1 else ""
            out.append(f"FileScan {fmt}")
        else:
            out.append(name)
    return "\n".join(out)
