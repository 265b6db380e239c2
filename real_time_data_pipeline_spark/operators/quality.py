"""Data-quality checks as a DataFrame operator (reference A4 rebuilt).

The reference runs Soda Core SQL checks against the Gold table
(`soda/checks/checks_gold.yml:2-11`: row_count > 0, missing_count = 0,
avg between 0 and 1), scheduled by Airflow (`dags/gbfs_pipeline_dag.py:57-62`).
Here the same assertions are engine-native: a list of declarative
checks compiled into ONE aggregate pass over the table (single job, one
partial+final aggregate — no per-check scan), returning a tidy
(check_name, metric_value, passed) DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    metric: Column          # aggregate expression producing a numeric metric
    lo: float | None = None  # passed = lo <= metric <= hi (None = unbounded)
    hi: float | None = None


def row_count(name: str = "row_count", lo: float = 1.0) -> Check:
    return Check(name=name, metric=F.count(F.lit(1)).cast("double"), lo=lo)


def missing_count(col: str, hi: float = 0.0) -> Check:
    return Check(
        name=f"missing_count_{col}",
        metric=F.sum(F.col(col).isNull().cast("int")).cast("double"),
        lo=0.0,
        hi=hi,
    )


def avg_between(col: str, lo: float, hi: float) -> Check:
    return Check(name=f"avg_{col}", metric=F.avg(F.col(col)).cast("double"), lo=lo, hi=hi)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one aggregate pass.

    Returns columns: check_name (string), metric_value (double),
    passed (boolean).
    """
    agg_row = df.agg(*[c.metric.alias(c.name) for c in checks])
    # Unpivot the single metrics row via stack(); stays in one job.
    pairs = []
    for c in checks:
        pairs.append(F.lit(c.name))
        pairs.append(F.col(c.name))
    stacked = agg_row.select(
        F.stack(F.lit(len(checks)), *pairs).alias("check_name", "metric_value")
    )
    cond = F.lit(True)
    # passed is evaluated per-row against each check's bounds
    bounds = {c.name: (c.lo, c.hi) for c in checks}
    passed = None
    for name, (lo, hi) in bounds.items():
        this = F.lit(True)
        if lo is not None:
            this = this & (F.col("metric_value") >= F.lit(lo))
        if hi is not None:
            this = this & (F.col("metric_value") <= F.lit(hi))
        # NULL metrics (e.g. avg over an empty table) FAIL CLOSED: a
        # NULL `passed` would slip through gates filtering passed == False.
        this = F.coalesce(this, F.lit(False))
        branch = F.when(F.col("check_name") == name, this)
        passed = branch if passed is None else passed.when(F.col("check_name") == name, this)
    del cond
    return stacked.withColumn("passed", passed.otherwise(F.lit(False)))
