"""Scalable exact global ranking: row_number / ntile without a
single-partition window.

``Window.orderBy(...)`` with no partition spec funnels the entire
input through ONE task — the classic scale-killer for global ranks
(fine on a dimension, fatal on a fact table). The helpers here
compute the same exact, deterministic values with the zipWithIndex
pattern expressed in DataFrame ops:

1. range-repartition on the sort keys, so partition ``p`` holds only
   keys ordered before partition ``p+1``'s keys;
2. ``row_number`` over ``Window.partitionBy(partition_id)`` — every
   task ranks only its own partition's rows;
3. add each partition's cumulative row offset. The offsets come from
   a partition-id count aggregate that is numPartitions rows — a
   bounded, documented driver collect (same class as the engine's
   other bounded collects), broadcast back onto the data.

Requirements: the sort keys must form a TOTAL order (include a unique
tie-break column such as the row key); otherwise the range partitioner
may split equal keys across a boundary and the rank is only
sort-stable, not deterministic. The repartitioned frame is
``localCheckpoint``-ed so the count pass and the rank pass observe the
same sampled range boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "exact_ntile"]


def global_row_number(
    df: DataFrame,
    order_by: "list[Column | str]",
    rn_col: str = "rn",
    num_partitions: int | None = None,
) -> "tuple[DataFrame, int]":
    """Exact global ``row_number`` over ``order_by`` without a
    single-partition window. Returns ``(frame_with_rn, total_rows)``.

    Scale shape: one range shuffle of the input, one tiny
    (numPartitions-row) count aggregate collected to the driver, one
    broadcast join, one per-partition window. No stage ever sorts
    more than one partition's rows.
    """
    spark = df.sparkSession
    n_parts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = (
        df.repartitionByRange(n_parts, *order_by)
        .withColumn("_gr_pid", F.spark_partition_id())
        # Freeze the sampled range boundaries: the count pass below and
        # the rank pass must see identical partition assignments.
        .localCheckpoint()
    )
    sizes = {
        r["_gr_pid"]: r["c"]
        for r in part.groupBy("_gr_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off_df = spark.createDataFrame(offsets, schema="_gr_pid INT, _gr_off BIGINT")
    w = Window.partitionBy("_gr_pid").orderBy(*order_by)
    ranked = (
        part.join(F.broadcast(off_df), "_gr_pid")
        .withColumn(rn_col, F.row_number().over(w) + F.col("_gr_off"))
        .drop("_gr_pid", "_gr_off")
    )
    return ranked, acc


def exact_ntile(
    df: DataFrame,
    n_buckets: int,
    order_by: "list[Column | str]",
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ANSI ``ntile(n)`` over a global ordering, scalably.

    Standard ntile semantics: bucket sizes differ by at most one, the
    larger buckets first. Computed from the scalable global
    row_number via the closed-form bucket assignment, so the result is
    bit-identical to ``ntile(n) OVER (ORDER BY ...)`` — the DuckDB /
    ANSI oracle needs no adjustment — while the plan contains no
    unpartitioned window.
    """
    ranked, total = global_row_number(
        df, order_by, rn_col="_gr_rn", num_partitions=num_partitions
    )
    q, r = divmod(total, n_buckets) if total else (0, 0)
    rn = F.col("_gr_rn")
    if q == 0:
        # More buckets than rows: row i lands alone in bucket i.
        bucket = rn
    else:
        head = r * (q + 1)  # rows covered by the (q+1)-sized buckets
        bucket = F.when(
            rn <= F.lit(head), F.expr(f"(_gr_rn - 1) div {q + 1}") + F.lit(1)
        ).otherwise(
            F.lit(r) + F.expr(f"(_gr_rn - 1 - {head}) div {q}") + F.lit(1)
        )
    return ranked.withColumn(out_col, bucket.cast("int")).drop("_gr_rn")
