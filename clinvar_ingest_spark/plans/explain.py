"""Physical-plan introspection helpers.

The engine's performance contract is enforced in tests, not prose:
filters reach the parquet scan (PushedFilters), projections prune
columns (ReadSchema), small dims broadcast, Python appears only as
ArrowEvalPython/MapInPandas (never row-at-a-time BatchEvalPython), and
hot expressions stay inside WholeStageCodegen. tests/test_plans.py
asserts these on the real queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    p = executed_plan(df)
    return {n: n in p for n in needles}


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every scan node in the plan."""
    p = executed_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", p)


def read_schemas(df: DataFrame) -> list[str]:
    p = executed_plan(df)
    return re.findall(r"ReadSchema: ([^\n,]*struct<[^\n]*)", p)
