"""Registry plumbing for named queries + DuckDB oracles.

Contract (driver's __spark_entry__ protocol):
- a query is ``fn(spark, sf_dir) -> DataFrame``;
- its oracle is an ANSI SQL string DuckDB can run against views named
  after the parquet tables;
- column names AND dtypes must agree between the two (the driver sorts
  columns by name before hashing values), so every computed column is
  aliased identically on both sides;
- floating-point aggregates are rounded on both sides to make the
  value-hash insensitive to summation order (Spark shuffles partial
  aggregates in nondeterministic order; an unrounded double hash would
  flap).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as a named query with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
