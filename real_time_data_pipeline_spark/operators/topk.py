"""Top-k operators: global and per-group ranking.

The reference's only ordering is a documentation SQL example
(`README.md:74-79`: ORDER BY ... LIMIT 50) — rebuilt here as real
operators:

- ``topk``: ``orderBy(...).limit(k)``. Spark plans TakeOrderedAndProject:
  each partition keeps a k-row heap, the driver merges — no global
  sort, no full shuffle. This is THE scalable global top-k at 100 TB.
- ``topk_per_group``: ``row_number`` over a per-key window + filter.
  One shuffle on the keys; the per-key sort spills safely. With
  Spark's WindowGroupLimit optimization the rank filter is pushed
  into the sort so only k rows per key survive the exchange.

Callers must make the ordering total (include a unique tie-break
column) or results are run-dependent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — heap per partition)."""
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], k: int, rank_col: str = "rk"
) -> DataFrame:
    """Top-k rows per key group, rank exposed as ``rank_col``."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)
