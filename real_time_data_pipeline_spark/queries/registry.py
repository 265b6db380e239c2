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

import functools
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


def _with_cache_hygiene(fn: QueryFn) -> QueryFn:
    """Drain the PREVIOUS query's tracked transient caches when the
    next registry query is invoked (ADVICE r13 #4).

    A few queries `persist_tracked` a frame reused by two branches of
    their own plan (e.g. the market-basket corpus distinct). The
    external driver consumes `queries()` raw and never calls
    `release_caches`, so a long-lived driver session would otherwise
    accumulate one disk-persisted block set per executed query (disk
    blocks are not LRU-evicted). Wrapping each call in `cache_scope`
    — the literal ADVICE suggestion — would unpersist on fn return,
    BEFORE the caller's collect, so both consuming branches would
    recompute the shared frame and the persist would be dead weight.
    Instead each invocation releases whatever the previous invocation
    left registered — but only caches whose buffers have actually been
    BUILT (``release_caches(materialized_only=True)``). The guard
    matters for correctness, not just cost: the ranking helpers
    persist a range-shuffled frame precisely to canonicalize their
    count/rank branches onto ONE exchange, and unpersisting it before
    its first action de-canonicalizes the branches and silently
    corrupts global offsets (ranking.py module doc). So a caller that
    builds query B's frame before collecting query A's keeps A's
    not-yet-materialized persists intact; they are drained by a later
    invocation once consumed. For already-materialized caches a
    recompute after release can only change cost, never values (every
    oracle-checked value is deterministic by doctrine). Accumulation
    stays bounded at the uncollected queries' transient caches —
    ONE query's in the sequential driver. Shared index artifacts are
    unaffected: they are checkpoint-materialized, never tracked
    persists (artifacts.py module doc). Residual (explicit, r15
    review): a result ABANDONED without ever running an action keeps
    its unmaterialized persists registered forever — no registry code
    path releases them. A long-lived service with abandon-on-error
    paths must wrap registry calls in `cache_scope` or call
    `release_caches()` (full drain) at its own safe points; the
    sequential driver always collects, so it never hits this.

    Preconditions (unchanged but now explicit): registry queries on a
    given SparkSession must be invoked from ONE thread — the drain and
    the materialization probe are process-global and are not safe
    against a sibling registry query collecting concurrently. Callers
    running un-scoped `persist_tracked` users concurrently with
    registry queries must wrap them in `cache_scope` (the existing
    doctrine for foreachBatch bodies), which this drain cannot
    touch."""

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from real_time_data_pipeline_spark.operators.materialize import (
            release_caches,
        )

        release_caches(materialized_only=True)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _with_cache_hygiene(spec.fn) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
