"""Physical-plan audit helpers: make "is this the plan I want at
100 TB?" a programmatic question.

The engine's scale posture lives in plan properties, not timings:
filters pushed into scans, pruned read schemas, broadcast dimension
joins, per-partition top-k heaps, no cartesian products. These helpers
extract those facts from a DataFrame's executed plan so tests (and
operators' own assertions) can gate on them — tests/test_plans.py is
the consumer.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """Physical plan tree string (after AQE initial planning)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` text — scan details incl. PushedFilters."""
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (pruning check)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_cartesian_product(df: DataFrame) -> bool:
    return "CartesianProduct" in executed_plan(df)
