"""Streaming sinks: parquet append, idempotent upsert, multi-sink fan-out.

Reference sinks rebuilt (SURVEY §2.2):
- K2/K3 parquet append + checkpoint → `parquet_append_sink`;
- K5 foreachBatch JDBC append (which produced duplicate/evolving
  window rows in Postgres — SURVEY §2.6 W3) → `foreach_batch_upsert`,
  an IDEMPOTENT merge keyed on the window identity: re-delivered
  micro-batches and update-mode re-emissions overwrite instead of
  duplicating;
- W4 multi-query fan-out → `start_fanout` (one lineage, N sinks, each
  with its own checkpoint).

The upsert here merges into a parquet table via read-union-overwrite,
which is correct for dimension-sized gold tables (the reference's
Postgres gold is exactly that). A 100 TB gold layer would swap the
merge body for Delta/Iceberg MERGE INTO or JDBC upsert — the
`foreachBatch` contract and keying logic are identical.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def with_trigger(writer, trigger: str | None):
    """Apply a trigger policy (reference W5 exposes none — SURVEY §2.6).

    ``trigger``: None → default as-fast-as-available micro-batches;
    "Ns"/"N seconds" → processing-time cadence; "once" → single batch
    then stop (backfill-style); "available-now" → drain all available
    data in bounded batches then stop.
    """
    if trigger is None:
        return writer
    if trigger == "once":
        return writer.trigger(once=True)
    if trigger == "available-now":
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=trigger)


def parquet_append_sink(
    df: DataFrame, path: str, checkpoint: str, query_name: str, trigger: str | None = None
) -> StreamingQuery:
    """Append-mode parquet sink with its own checkpoint (bronze/silver)."""
    writer = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    return with_trigger(writer, trigger).start()


def upsert_parquet(batch_df: DataFrame, path: str, keys: Sequence[str]) -> None:
    """Merge a micro-batch into a parquet table, last-writer-wins per key."""
    spark = batch_df.sparkSession
    new = batch_df.withColumn("__v", F.lit(1))
    if os.path.exists(path):
        old = spark.read.parquet(path).withColumn("__v", F.lit(0))
        merged = old.unionByName(new)
    else:
        merged = new
    w = Window.partitionBy(*keys).orderBy(F.desc("__v"))
    result = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__v")
    )
    # Materialize before overwrite (reading and overwriting the same
    # path in one plan would race).
    result.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)


def foreach_batch_upsert(
    df: DataFrame, path: str, keys: Sequence[str], checkpoint: str, query_name: str
) -> StreamingQuery:
    """Update-mode gold sink with idempotent per-key merge.

    Exactly-once effect even under micro-batch retries: the merge is
    keyed, so re-processing batch N rewrites the same rows.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        upsert_parquet(batch_df, path, keys)

    return (
        df.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )


def start_fanout(sinks: Sequence[tuple[DataFrame, dict]]) -> list[StreamingQuery]:
    """Start N streaming queries off (possibly shared) lineages.

    Each entry is (df, writeStream-kwargs-like dict with 'format',
    'outputMode', 'options', 'queryName'). Every query gets its own
    checkpoint — the reference's W4 pattern.
    """
    queries = []
    for df, spec in sinks:
        writer = df.writeStream.format(spec["format"]).outputMode(spec["outputMode"])
        for k, v in spec.get("options", {}).items():
            writer = writer.option(k, v)
        if "queryName" in spec:
            writer = writer.queryName(spec["queryName"])
        queries.append(writer.start())
    return queries
