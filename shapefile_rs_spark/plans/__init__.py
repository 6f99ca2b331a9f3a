"""Physical-plan inspection helpers.

The optimizer properties the engine relies on at 100 TB — column pruning
reaching the parquet scan, filter pushdown, broadcast joins staying
broadcast, hot paths inside whole-stage codegen — are asserted, not hoped
for.  These helpers give tests (and users auditing a deployment) one
place to read an executed plan and check those properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The formatted physical plan Spark would run for ``df``."""
    return df._jdf.queryExecution().executedPlan().toString()


def read_schema(df: DataFrame) -> str:
    """The ``ReadSchema`` the parquet scan was pruned to ('' if no scan)."""
    plan = executed_plan(df)
    if "ReadSchema:" not in plan:
        return ""
    return plan.split("ReadSchema:")[1].splitlines()[0].strip()


def pushed_filters(df: DataFrame) -> str:
    """The ``PushedFilters`` reaching the parquet scan ('' if none)."""
    plan = executed_plan(df)
    if "PushedFilters:" not in plan:
        return ""
    return plan.split("PushedFilters:")[1].splitlines()[0].strip()


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in executed_plan(df)


def python_eval_nodes(df: DataFrame) -> list:
    """Python-execution nodes in the plan (row-at-a-time ``BatchEvalPython``
    is the slow path; ``ArrowEvalPython``/``MapInPandas`` are the sanctioned
    Arrow-batched ones)."""
    plan = executed_plan(df)
    return [
        node
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        if node in plan
    ]


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans — widen them (CLAUDE.md: a
    single expression choice can silently drop a 20× span).  The text
    plan renders each span as a ``*(n)`` node prefix (the literal string
    'WholeStageCodegen' never appears), so count distinct span ids.

    Caveat: a plan containing an Exchange prints as an un-finalized
    ``AdaptiveSparkPlan`` with NO codegen annotations until it executes —
    run an action first (or inspect a map-only sub-plan) before counting;
    this helper is reliable as-is for exchange-free plans."""
    import re

    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))
