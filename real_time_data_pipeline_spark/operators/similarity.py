"""Dedup + similarity-search operators for LLM-data pipelines.

North-star extensions: exact dedup, n-gram Jaccard, MinHash+LSH,
SimHash, embedding cosine near-dup, ANN top-k. Design rules:

- Candidate generation NEVER goes quadratic on the full corpus: exact
  dedup is a hash groupBy; Jaccard pairs come from a shingle-posting
  self-join (only docs sharing a shingle meet); MinHash/LSH meets docs
  only within a band bucket; embedding near-dup blocks on a bucket key
  (label here; LSH hyperplane buckets in `hyperplane_lsh_bucket`).
- All hashes are deterministic md5-derived integers computable in
  ANSI SQL, so every step has a DuckDB oracle twin.
- Vector math is `zip_with`/`aggregate` on `array<double>` — JVM
  codegen, bit-identical to DuckDB's list_cosine_similarity (verified
  empirically in tests), no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.text import hash32, word_shingles

# MinHash parameters (shared with any SQL oracle that reproduces them).
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
MINHASH_NUM = 96
MINHASH_BAND_ROWS = 2  # 48 bands of 2 rows → P(miss | jaccard=0.5) ≈ 1e-6


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups by content hash.

    Returns (content_hash, n_copies, canonical_id) — one row per
    distinct content, canonical = min id. A plain hash groupBy: one
    shuffle on the 128-bit hash, perfectly uniform keys.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def shingle_postings(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) postings list — DISTINCT word n-grams per doc."""
    return (
        df.select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    Postings self-join: docs meet only on shared shingles, so the
    candidate set is sparse (inverted-index semantics, not a cross
    join). Per-pair intersection counts + per-doc shingle counts give
    exact Jaccard. Hot shingles (stopword runs) are the skew risk at
    scale — production would drop top-frequency shingles first; AQE
    skew-join splitting covers the rest.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 6.
    """
    # NOTE: no .cache() — caching would pin the postings in memory and
    # disable AQE re-planning below it; recomputing a projection+explode
    # is cheaper than blocking runtime partition coalescing.
    sh = shingle_postings(df, id_col, text_col, n)
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = MINHASH_NUM
) -> DataFrame:
    """(id, i, sig) MinHash signature rows.

    Each shingle's base hash x (32-bit md5 prefix) runs through the
    universal-hash family h_i(x) = ((2i+1)·x + 7919·i + 1) mod p; the
    per-doc minimum over shingles is the signature element. Computed
    as one explode over (shingle × hash-index) then a min-groupBy —
    partial aggregation collapses rows map-side before the shuffle.
    """
    sh = shingle_postings(df, id_col, text_col, n).withColumn("x", hash32("shingle"))
    idx = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("i")
    expanded = sh.select(F.col(id_col), F.col("x"), idx)
    h = (
        (F.lit(2) * F.col("i") + 1) * F.col("x") + F.lit(7919) * F.col("i") + 1
    ) % F.lit(MINHASH_PRIME)
    return expanded.select(F.col(id_col), F.col("i"), h.alias("h")).groupBy(
        id_col, "i"
    ).agg(F.min("h").alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, band_rows: int = MINHASH_BAND_ROWS
) -> DataFrame:
    """Candidate pairs from banded LSH over MinHash signatures.

    Band key = (band index, concatenated in-band signature values);
    docs collide iff a whole band matches. Self-join per bucket →
    distinct pairs. Bucket sizes are tiny for non-near-dup corpora, so
    the join is sparse; the full-corpus cross join never happens.
    """
    banded = signatures.withColumn("band", (F.col("i") / band_rows).cast("int"))
    keys = banded.groupBy(id_col, "band").agg(
        F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "i", "sig")))).alias(
            "band_key"
        )
    )
    a = keys.select(F.col(id_col).alias("id_a"), "band", "band_key")
    b = keys.select(F.col(id_col).alias("id_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over distinct words (md5-derived bit votes).

    For each word hash h, bit j votes +1 if set else −1; the signature
    sets bit j iff the vote sum is positive. One explode over
    (word × 32 bits) then two groupBys — all integer arithmetic,
    SQL-reproducible. Production would widen to 64/128 bits; 32 keeps
    every intermediate comfortably in BIGINT on both engines.
    """
    w = (
        df.select(F.col(id_col), F.explode(word_shingles(text_col, 1)).alias("word"))
        .distinct()
        .withColumn("h", hash32("word"))
    )
    bits = w.select(
        F.col(id_col),
        F.col("h"),
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("j"),
    )
    # shiftright/shiftleft with a column shift amount need the SQL form
    vote = F.when(F.expr("shiftright(h, CAST(j AS INT)) & 1") == 1, 1).otherwise(-1)
    per_bit = bits.groupBy(id_col, "j").agg(F.sum(vote).alias("v"))
    bit_val = F.when(
        F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")
    ).otherwise(F.lit(0).cast("long"))
    return per_bit.groupBy(id_col).agg(F.sum(bit_val).alias("simhash"))


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (codegen, exact)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float,
) -> DataFrame:
    """Near-duplicate embedding pairs within blocking buckets.

    Quadratic only inside a bucket — the blocking column (a cluster
    id, shard key, or LSH bucket from `hyperplane_lsh_bucket`) keeps
    the join sparse at corpus scale.
    Output: (id_a, id_b, <block_col>, cos) with id_a < id_b.
    """
    v = df.select(
        F.col(id_col), F.col(block_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col(block_col), F.col("v").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col(block_col).alias("__blk"), F.col("v").alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, (F.col(block_col) == F.col("__blk")) & (F.col("id_a") < F.col("id_b")))
        .where(cos >= threshold)
        .select("id_a", "id_b", F.col(block_col), F.round(cos, 6).alias("cos"))
    )


def ann_brute_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The (small) query set broadcasts against the corpus — one pass,
    no shuffle of the corpus — then per-query top-k via row_number.
    This is the ANN baseline; `hyperplane_lsh_bucket` provides the
    sub-linear scale path.
    Output: (query_id, neighbor_id, cos, rk).
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    cos = cosine(F.col("qv"), F.col("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )


def hyperplane_lsh_bucket(
    df: DataFrame, vec_col: str, num_planes: int = 8, seed_tag: str = "plane"
) -> Column:
    """Random-hyperplane LSH bucket id (0 .. 2^num_planes − 1).

    Plane components are deterministic md5-derived integers in
    [−500, 500), so the bucketing is reproducible anywhere (including
    SQL). Vectors in the same bucket agree on the sign of num_planes
    random projections — the standard sub-linear candidate generator
    for cosine ANN.
    """
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for j in range(num_planes):
        # component d of plane j: md5("plane-j-d") → int in [-500, 500)
        comp = lambda d: (  # noqa: E731
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed_tag}-{j}-"), d.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 1000
            - 500
        ).cast("double")
        dot = F.aggregate(
            F.zip_with(v, F.transform(v, lambda _, i: comp(i)), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket
