"""Continuous corpus ingestion with incremental dedup.

The batch dedup family answers "which of these N docs duplicate each
other"; a production corpus is not static — documents arrive
continuously, and each micro-batch must be deduped against EVERYTHING
already accepted, not just its own rows. This module composes the
engine's existing primitives into that streaming pattern:

1. exact layer — md5 content hash against the accepted-hash store
   (new exact duplicates drop immediately);
2. near-dup layer — MinHash signatures against the accepted-signature
   store: banded-LSH collision candidates, exact-Jaccard verify, drop
   if any accepted doc is within the threshold;
3. survivors append to the corpus AND their hashes/signatures merge
   into the stores (crash-safe `upsert_parquet` merge), so later
   batches dedup against them.

State lives in parquet tables, not executor memory: the pattern
scales to corpus sizes that could never fit in a streaming state
store, and a crashed job resumes from the last committed store. The
within-batch step reuses `exact_dedup_groups` + `jaccard_pairs` +
`connected_components` semantics via keep-one (min id wins).

At 100 TB the signature store join is the cost center: both stores
are bucketed by hash/band key on disk in production so the per-batch
candidate probe is a bucket-pruned join, and the micro-batch side
(small) broadcasts — the corpus-side store never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.similarity import (
    MINHASH_BAND_ROWS,
    MINHASH_NUM,
    jaccard_pairs,
    minhash_signatures,
)
from real_time_data_pipeline_spark.operators.text import word_shingles
from real_time_data_pipeline_spark.streaming.sinks import table_exists, upsert_parquet


def _band_keys(sig_col: str, band_rows: int = MINHASH_BAND_ROWS, num_hashes: int = MINHASH_NUM):
    """(band, band_key) pairs exploded from a signature array column."""
    n_bands = num_hashes // band_rows
    return F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.array_join(
                    F.transform(
                        F.slice(F.col(sig_col), b * band_rows + 1, band_rows),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ).alias("key"),
            ),
        )
    )


def ingest_batch(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    corpus_path: str,
    store_path: str,
    n: int = 3,
    threshold: float = 0.5,
) -> int:
    """Dedup one micro-batch against the accepted corpus; returns the
    number of newly accepted documents.

    Layers: within-batch keep-one (exact + near-dup, min id wins),
    then exact-hash probe against the store, then LSH-candidate +
    exact-Jaccard probe against the store. Survivors append to
    ``corpus_path`` and merge into ``store_path``
    (content_hash, sig, shingle array per accepted doc).
    """
    spark = batch.sparkSession

    # --- within-batch dedup: exact then near-dup keep-one ------------
    batch = batch.select(F.col(id_col), F.col(text_col)).where(
        F.length(F.trim(F.col(text_col))) > 0
    )
    w_exact = F.row_number().over(
        Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    )
    batch = batch.withColumn("__rn", w_exact).where(F.col("__rn") == 1).drop("__rn")
    pairs = jaccard_pairs(batch, id_col, text_col, n=n, threshold=threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    batch = batch.join(losers, id_col, "left_anti").localCheckpoint()

    # --- probe the accepted store -------------------------------------
    sigs = minhash_signatures(batch, id_col, text_col, n=n)
    shs = batch.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_hash"),
    )
    new_entries = (
        shs.join(sigs, id_col)
        .join(
            batch.select(
                F.col(id_col),
                F.array_distinct(word_shingles(text_col, n)).alias("shingles"),
            ),
            id_col,
        )
    )
    if table_exists(spark, store_path):
        store = spark.read.parquet(store_path)
        # exact layer
        dup_exact = new_entries.join(
            store.select("content_hash").distinct(), "content_hash", "left_semi"
        ).select(id_col)
        survivors = new_entries.join(dup_exact, id_col, "left_anti")
        # near-dup layer: band-key collisions against the store, then
        # exact Jaccard on the stored shingle arrays. The micro-batch
        # side is small -> broadcast it; the store never shuffles.
        cand_new = survivors.select(F.col(id_col), _band_keys("sig").alias("bk")).select(
            id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("band_key")
        )
        cand_old = store.select(
            F.col(id_col).alias("__old_id"), _band_keys("sig").alias("bk"), "shingles"
        ).select(
            "__old_id",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("band_key"),
            F.col("shingles").alias("__old_shs"),
        )
        collisions = (
            cand_old.join(
                F.broadcast(cand_new), ["band", "band_key"]
            )
            .select(id_col, "__old_id", "__old_shs")
            .distinct()
        )
        probe = collisions.join(
            F.broadcast(new_entries.select(id_col, "shingles")), id_col
        )
        inter = F.size(F.array_intersect(F.col("shingles"), F.col("__old_shs")))
        union = F.size("shingles") + F.size("__old_shs") - inter
        near = (
            probe.where((inter / union) >= threshold).select(id_col).distinct()
        )
        survivors = survivors.join(near, id_col, "left_anti").localCheckpoint()
    else:
        survivors = new_entries.localCheckpoint()

    n_new = survivors.count()
    if n_new:
        accepted_ids = survivors.select(id_col)
        (
            batch.join(F.broadcast(accepted_ids), id_col)
            .write.mode("append")
            .parquet(corpus_path)
        )
        upsert_parquet(survivors, store_path, keys=[id_col])
    return n_new


def dedup_ingest_sink(
    df: DataFrame,
    id_col: str,
    text_col: str,
    corpus_path: str,
    store_path: str,
    checkpoint: str,
    query_name: str = "dedup_ingest",
    threshold: float = 0.5,
):
    """Streaming sink: continuously ingest documents with dedup
    against everything previously accepted (foreachBatch over
    `ingest_batch`)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(batch_df, id_col, text_col, corpus_path, store_path,
                     threshold=threshold)

    return (
        df.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
