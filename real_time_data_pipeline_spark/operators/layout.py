"""Multi-dimensional data layout (Z-order clustering) for scan
pruning.

Partition pruning and zone maps skip data on ONE leading dimension; a
100 TB table queried by both ``user_id`` and ``value`` ranges needs a
layout where files bound BOTH columns. The Z-order (Morton) curve
interleaves the bits of the dimensions so range-close rows in any
dimension land near each other on the curve; ``repartitionByRange``
on the z-value plus ``sortWithinPartitions`` then yields files whose
per-file min/max shrink in every interleaved dimension — the same
clustering Delta's OPTIMIZE ZORDER BY performs, built from primitives.

The bit-interleave is generated once as SQL text so the engine and
any ANSI oracle evaluate the identical integer formula.

Scaling caveat (standard for Morton curves): interleaving favors the
dimension with more significant bits — a 4-bit user_id interleaved
with a 9-bit value clusters mostly by value. For balanced pruning,
pre-scale each dimension to a comparable range (e.g. its percentile
bucket via ``operators/ranking.exact_ntile`` with 2^k buckets) before
interleaving; the raw form is kept here because it is a pure
row-local integer formula (no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Z_BITS = 16


def z_value_sql(col_a: str, col_b: str, bits: int = Z_BITS) -> str:
    """Morton-interleave SQL expression: bit i of ``col_a`` → bit 2i,
    bit i of ``col_b`` → bit 2i+1. Both inputs must be non-negative
    BIGINT expressions; identical text runs on Spark and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(
            f"((({col_a} >> {i}) & 1) * (CAST(1 AS BIGINT) << {2 * i}))"
            f" + ((({col_b} >> {i}) & 1) * (CAST(1 AS BIGINT) << {2 * i + 1}))"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    z_col: str = "_z",
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-order curve of two integer columns:
    range-partition + sort within partitions by the interleaved
    z-value, so each output file's zone map bounds BOTH dimensions."""
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    with_z = df.withColumn(z_col, F.expr(z_value_sql(col_a, col_b)))
    return with_z.repartitionByRange(n_parts, z_col).sortWithinPartitions(z_col)
