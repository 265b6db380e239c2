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


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: "list[str] | None" = None,
) -> int:
    """Compact a small-file parquet table (the streaming-sink
    pathology: every micro-batch appends a file, and a month of
    1-second triggers leaves millions of KB-sized files that drown a
    scan in open/close and task-schedule overhead) into
    ~``target_file_bytes`` files, preserving the partition layout.
    Returns the file count after compaction.

    Scale shape: file count is computed from the table's actual
    on-disk bytes (Hadoop FS listing, no data read); the rewrite is
    one coalesce-free repartition — at most one shuffle of the data,
    the same cost every compactor pays — committed with the
    rename-swap so readers never see a half-compacted table and a
    crash leaves the original intact. Partition layout is
    auto-detected like `expire_tombstones` when not given. Run it
    from the scheduler (pipelines/schedule) off the hot path.
    """
    from real_time_data_pipeline_spark.streaming.sinks import (
        _detect_partition_cols,
        _swap_paths,
        _swap_write,
    )

    fs, jpath, jtmp, jold, tmp_path, exists = _swap_paths(spark, path)
    if not exists:
        return 0
    if partition_cols is None:
        partition_cols = _detect_partition_cols(fs, jpath)

    def walk_bytes(p):
        total = 0
        for st in fs.listStatus(p):
            if st.isDirectory():
                total += walk_bytes(st.getPath())
            elif st.getPath().getName().endswith(".parquet"):
                total += st.getLen()
        return total

    total_bytes = walk_bytes(jpath)
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    # Repartition by the partition columns so each output partition
    # directory is written by as few tasks as possible (hash keeps
    # same-partition rows together); plain round-robin when flat.
    if partition_cols:
        compacted = df.repartition(n_files, *partition_cols)
    else:
        compacted = df.repartition(n_files)
    _swap_write(
        fs, compacted, path, tmp_path, jpath, jtmp, jold, True,
        partition_by=partition_cols or None,
    )

    def count_files(p):
        n = 0
        for st in fs.listStatus(p):
            if st.isDirectory():
                n += count_files(st.getPath())
            elif st.getPath().getName().endswith(".parquet"):
                n += 1
        return n

    return count_files(_swap_paths(spark, path)[1])
