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


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", plan)


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


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df)


def has_partial_agg(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "HashAggregate" in plan and (
        "partial" in plan.lower() or plan.count("HashAggregate") >= 2
    )
