"""Helpers for interrogating executed/optimized physical plans."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def count_shuffles(df: DataFrame) -> int:
    """Number of exchange operators in the physical plan (pre-AQE)."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan))


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan carries PushedFilters (predicate pushdown)."""
    plan = explain_str(df, "formatted")
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def uses_row_python(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python (BatchEvalPython) —
    the engine treats this as a defect; only Arrow paths are allowed."""
    plan = explain_str(df, "simple")
    return "BatchEvalPython" in plan


def plan_summary(df: DataFrame) -> dict:
    plan = explain_str(df, "simple")
    return {
        "shuffles": count_shuffles(df),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "arrow_python": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
        ),
        "row_python": plan.count("BatchEvalPython"),
        "codegen_stages": len(re.findall(r"WholeStageCodegen", plan)),
    }
