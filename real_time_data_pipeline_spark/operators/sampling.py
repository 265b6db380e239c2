"""Deterministic sampling / dataset-split operators.

Training-data pipelines need splits that are (a) reproducible across
runs and engines, (b) stable under re-partitioning and insertion of
new rows, and (c) computable without a shuffle. Hashing a stable key
gives all three — unlike `df.sample()`, whose output depends on
partition layout and seed plumbing.

Everything here is built-in-function column arithmetic (md5 → hex →
integer bucket), so it runs inside whole-stage codegen and is
bit-reproducible in any engine with md5 (the DuckDB oracles replicate
it verbatim).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, salt: str, n_buckets: int = 100) -> Column:
    """Stable bucket in [0, n_buckets) from md5(salt ++ key).

    Uses the first 8 hex chars (32 bits — sign-safe in a signed 64-bit
    conv) so any engine that can md5 a string reproduces the bucket.
    The salt namespaces independent decisions (split vs. sample vs.
    shard) so they are statistically independent of each other.
    """
    c = F.col(key) if isinstance(key, str) else key
    hex8 = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8)
    return (F.conv(hex8, 16, 10).cast("long") % n_buckets).alias("bucket")


def sql_hash_bucket(key_expr: str, salt: str, n_buckets: int = 100) -> str:
    """DuckDB expression mirroring :func:`hash_bucket` exactly."""
    return (
        f"(('0x' || substring(md5('{salt}' || CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {n_buckets})"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    salt: str = "split",
    train: int = 80,
    val: int = 10,
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label.

    Percentages are bucket cuts on :func:`hash_bucket` (train+val must
    be ≤ 100; the remainder is test). Adding rows later never moves an
    existing row's split — the property that keeps eval sets
    uncontaminated across dataset versions.
    """
    b = hash_bucket(key_col, salt, 100)
    return df.withColumn(
        "split",
        F.when(b < train, "train").when(b < train + val, "val").otherwise("test"),
    )


def deterministic_sample(df: DataFrame, key_col: str, rate: float, salt: str = "sample") -> DataFrame:
    """Keep a stable ~rate fraction of rows by hash cut (no RNG, no
    partition-layout dependence). Use for reproducible corpus
    down-sampling; compose with `hash_split` via distinct salts."""
    n = 1_000_000
    return df.where(hash_bucket(key_col, salt, n) < int(rate * n))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum down-sampling (corpus re-balancing).

    Each stratum keeps ~its own rate of rows by hash cut — e.g. keep
    30% of the dominant language, 100% of the rare ones. Same
    determinism contract as `deterministic_sample`: no RNG, no
    partition-layout dependence, rows never flip in/out when other
    rows are added, and any engine with md5 reproduces the decision.
    Pure column arithmetic — the filter runs inside codegen, no
    shuffle.
    """
    n = 1_000_000
    s = F.col(strata_col)
    thr = F.lit(int(default_rate * n))
    expr = None
    for k, rate in rates.items():
        cond = s == F.lit(k)
        expr = F.when(cond, int(rate * n)) if expr is None else expr.when(cond, int(rate * n))
    thr = thr if expr is None else expr.otherwise(thr)
    return df.where(hash_bucket(key_col, salt, n) < thr)
