"""Join operators: broadcast-aware equi joins, semi/anti, range, as-of.

The reference contains no joins at all (SURVEY §2.7), so this module
is built from the north-star requirement: a user of a general analytics
engine needs the full join family, each expressed so Catalyst picks the
right physical strategy at 100 TB:

- dimension joins: explicit ``F.broadcast`` on the small side — a
  region/nation/supplier table must never shuffle the fact table;
- semi/anti: ``left_semi`` / ``left_anti`` (no payload columns pulled
  through the shuffle);
- range join: equi keys + range predicate — planned as a sort-merge
  join with the range as a post-join filter on the merged keys;
- as-of join: Spark has no native as-of. The scalable form here is the
  union-and-backfill trick: tag both sides, union, sort per key by
  event time, carry the last right-side values forward with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding window,
  keep left rows. ONE shuffle + per-key sort — no per-row probe, no
  broadcast of a big side, no Python. This is how you as-of-join two
  10 TB tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi join with the dimension side explicitly broadcast."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right`` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Sequence[tuple[str, str]],
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi keys + range predicate in one join condition.

    Keeping the equi keys in the condition is what lets Catalyst plan a
    hash/sort-merge join and apply the range as a cheap residual filter;
    a pure range condition would degenerate to a nested-loop join.
    """
    cond = None
    for lc, rc in equi:
        c = left[lc] == right[rc]
        cond = c if cond is None else (cond & c)
    cond = range_cond if cond is None else (cond & range_cond)
    return left.join(right, on=cond, how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the (skewed) left side, replicate
    the right side ``salt`` ways.

    A hot key that would pin one reducer is spread across ``salt``
    partitions; the right side's matching rows are exploded once per
    salt bucket so every bucket can complete the join locally. The
    salt is a deterministic hash of the whole left row — no RNG, so
    reruns produce identical partitioning. Use when AQE's skew-join
    splitting isn't available (e.g. a non-AQE stage or a stream-static
    join); cost = right side inflated ×salt, so keep the right side
    the smaller input.
    """
    lsalt = F.pmod(F.abs(F.hash(*[F.col(c) for c in left.columns])), F.lit(salt))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    cond = (l[left_key] == r[right_key]) & (l["__salt"] == r["__salt"])
    out = l.join(r, cond, how)
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[left_on]`` within the same ``by`` keys.

    Union-and-backfill: O(n log n) per key partition, single shuffle on
    ``by``. Right-side values surface as ``<col><suffix>`` (NULL when
    no right row precedes the left row).

    Right rows carrying the same event time as a left row DO match
    (<=), because right rows sort before left rows at equal time.
    Callers should deduplicate the right side per (by, right_on) first
    if it can contain ties — which right row wins a tie is otherwise
    unspecified (same as DuckDB's ASOF JOIN).
    """
    by = list(by)
    out_right = {c: f"{c}{suffix}" for c in right_cols}

    l_tagged = left.withColumn("__t", F.col(left_on)).withColumn("__is_left", F.lit(True))
    # Unique right-side projection (right_on may itself be a payload col).
    r_proj = list(dict.fromkeys([*by, right_on, *right_cols]))
    r_tagged = (
        right.select(*r_proj)
        .withColumn("__t", F.col(right_on))
        .withColumn("__is_left", F.lit(False))
    )
    # Rename right payload so it never collides with left columns.
    for c, renamed in out_right.items():
        r_tagged = r_tagged.withColumnRenamed(c, renamed)
    if right_on not in right_cols:
        r_tagged = r_tagged.drop(right_on)

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for renamed in out_right.values():
        unioned = unioned.withColumn(renamed, F.last(F.col(renamed), ignorenulls=True).over(w))

    return unioned.where(F.col("__is_left")).select(*left.columns, *out_right.values())
