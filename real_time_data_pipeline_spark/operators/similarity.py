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

from real_time_data_pipeline_spark.operators.materialize import (
    persist_tracked,
    reliable_materialize,
)
from real_time_data_pipeline_spark.operators.text import hash32, word_shingles

# MinHash parameters (shared with any SQL oracle that reproduces them).
MINHASH_PRIME = 4294967311  # smallest prime > 2^32
MINHASH_NUM = 96
MINHASH_BAND_ROWS = 2  # 48 bands of 2 rows → P(miss | jaccard=0.5) ≈ 1e-6


def _fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Re-parallelize before a row-multiplying op (explode, pair join).

    A small input (one parquet file locally; one hot partition on a
    cluster) otherwise funnels the whole fan-out through one task —
    the repartition costs one narrow shuffle of the SMALL pre-explode
    rows and buys full-width parallelism for the expensive stage.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(par, *[F.col(c) for c in cols])
    return df.repartition(par)


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
    """(id, shingle) postings list — DISTINCT word n-grams per doc.

    The per-doc dedup happens IN-ROW (`array_distinct` before the
    explode), not as a global `.distinct()`: (id, shingle) rows are
    already unique across docs by construction, so the in-row version
    is semantically identical and saves a full shuffle of the postings
    (the largest intermediate in the whole dedup family).
    """
    return _fan_out(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, n))).alias("shingle"),
    )


def _bucketed_pair_counts(
    postings: DataFrame,
    id_col: str,
    key_col: str,
    max_df: int | None,
    *,
    distinct_ids: bool = False,
    with_counts: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Inverted-index candidate generation shared by the pair family:
    from a (id, key) postings frame, build per-key buckets, expand
    unordered candidate pairs INSIDE each bucket, and count per-pair
    shared keys — the one-shuffle core of `jaccard_pairs`,
    `containment_pairs`, `directional_containment_pairs` and
    `winnowing_pairs`.

    Returns ``(inter, counts)``:

    - ``inter``: (id_a, id_b, inter) with id_a < id_b — the number of
      keys the pair shares, i.e. |A ∩ B| over the CAPPED postings.
    - ``counts``: (id_col, n_sh) per-doc post-cap key counts derived
      from the SAME materialized buckets (``None`` when
      ``with_counts=False``), so denominators are consistent with the
      intersections by construction.

    Scale shape (identical to the inlined originals, by design): ONE
    shuffle on ``key_col`` builds the inverted index; docs meet only
    on shared keys (never all-pairs); ``max_df`` drops hot-key buckets
    BEFORE anything else, bounding the in-bucket O(df²) expansion —
    without it one stopword-run shingle shared by millions of docs is
    an executor OOM, not mere skew. When ``with_counts`` is set the
    buckets feed two branches (counts + pair expansion), so they are
    persisted via `persist_tracked` — lazy, released per query, and
    executor loss recomputes through lineage instead of failing.

    ``distinct_ids`` selects ``collect_set`` for postings that repeat
    (id, key) rows (winnowing emits one row per selecting window), vs
    ``collect_list`` for postings already distinct per doc
    (`shingle_postings` dedups in-row before the explode).

    Extracted per the r10 verdict's duplication finding (~40 lines × 4
    sites); the consumer flip landed in r12 after the equivalence
    suite (`tests/test_operators.py::test_bucketed_pair_counts_*`)
    pinned the helper bit-identical and exchange-identical to the
    previously inlined copies — the flip changed call sites, not
    results or plans.
    """
    collect = F.collect_set if distinct_ids else F.collect_list
    buckets = postings.groupBy(key_col).agg(
        F.sort_array(collect(F.col(id_col))).alias("ids")
    )
    if max_df is not None:
        buckets = buckets.where(F.size("ids") <= max_df)
    counts: DataFrame | None = None
    if with_counts:
        buckets = persist_tracked(buckets)  # feeds counts AND pair expansion
        counts = (
            buckets.select(F.explode("ids").alias(id_col))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_sh"))
        )
    # i<j expansion DIRECTLY (r16, guide §1.2 per-task work): the ids
    # are sorted strictly ascending (distinct per bucket), so pairing
    # each element with only its tail emits exactly the id_a < id_b
    # structs, in the same order the old build-all-d²-then-filter form
    # produced them — identical rows, half the struct allocations and
    # no d²-element filter pass inside the interpreted HOF stage.
    # Guarded by size >= 2 below, so sequence(1, d-1) is never
    # descending.
    ids = F.col("ids")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(ids) - 1),
            lambda i: F.transform(
                F.slice(ids, i + 1, F.size(ids)),
                # ids[i-1] (0-based GetArrayItem), not element_at: the
                # winnowing plan audit pins "no element_at lambda" for
                # its gram construction and this shared core shows up
                # in that plan; i ∈ [1, d-1] so the index is always
                # valid under ANSI.
                lambda y: F.struct(ids[i - 1].alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    inter = (
        buckets.where(F.size("ids") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter, counts


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    Postings self-join: docs meet only on shared shingles, so the
    candidate set is sparse (inverted-index semantics, not a cross
    join). Per-pair intersection counts + per-doc shingle counts give
    exact Jaccard — computed over the CAPPED shingle sets (below).

    ``max_df`` drops shingles whose document frequency exceeds the cap
    (stopword runs shared by millions of docs). Without it, one hot
    shingle makes a multi-million-element bucket array and an
    O(|bucket|²) in-row pair expansion — an executor OOM at corpus
    scale, not mere skew. With it, per-bucket work is bounded by
    max_df² and the semantics are the standard near-dup practice:
    Jaccard over the shingles that carry signal (per-doc counts are
    post-cap too, so the ratio stays a true Jaccard of the capped
    sets). ``None`` disables the cap.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded 6.
    """
    # Candidate generation + per-doc counts come from the shared
    # inverted-index core (`_bucketed_pair_counts`): one shuffle on
    # the shingle, in-bucket pair expansion, post-cap denominators
    # derived from the SAME persisted buckets (see its docstring for
    # the full scale rationale).
    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n), id_col, "shingle", max_df
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    # shuffle_hash on the COUNTS side (here and in the three sibling
    # pair operators): without the hint Catalyst's static estimate
    # picks the PAIR frame as a broadcast build side — a frame that
    # grows with the corpus (quadratically in the uncapped regime),
    # i.e. the one side that must never be broadcast. The r14
    # cap-tradeoff harness caught it live: the 30x uncapped arm blew
    # the driver's broadcast build where r13's capped 30x run had
    # survived at the margin. With the hint both sides shuffle on the
    # id key and the per-doc counts (uniform, row-per-doc) hash-build
    # per partition — the plan that holds at 100 TB. Values
    # unchanged; plan-audited in tests/test_plans.py.
    return (
        inter.join(ca.hint("shuffle_hash"), "id_a")
        .join(cb.hint("shuffle_hash"), "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Shingle CONTAINMENT pairs: ``inter / min(|A|, |B|)`` ≥ threshold.

    The asymmetric cousin of Jaccard, and a distinct dedup capability:
    a short document fully quoted inside a long one scores near 1.0 on
    containment but can score arbitrarily low on Jaccard (the union is
    dominated by the long doc), so Jaccard-only dedup keeps
    subset-duplicates that containment catches — the standard check
    for boilerplate wrappers, quote-expansions, and version-extended
    documents in training-corpus curation.

    Same inverted-index scale shape as ``jaccard_pairs`` (docs meet
    only on shared shingles; ``max_df`` caps hot-shingle buckets to
    bound the in-bucket O(df²) pair expansion), so none of it is
    all-pairs.

    Output: (id_a, id_b, containment) with id_a < id_b, rounded 6.
    """
    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n), id_col, "shingle", max_df
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("inter") / F.least("n_a", "n_b")
    # shuffle_hash: never let the corpus-growing pair frame become a
    # broadcast build side (rationale at jaccard_pairs)
    return (
        inter.join(ca.hint("shuffle_hash"), "id_a")
        .join(cb.hint("shuffle_hash"), "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


def directional_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = 10_000,
) -> DataFrame:
    """DIRECTIONAL shingle containment: ordered (src, dst) pairs with
    ``|src ∩ dst| / |src|`` ≥ threshold — "src's shingles are (almost)
    all inside dst".

    Strictly more informative than `containment_pairs`' min-denominator
    form: min-containment says two docs overlap heavily but not WHICH
    one is the subset, while the directional ratio names the contained
    side — the curation decision ("drop src, it's a quote/wrapper
    inside dst") needs the direction. A long doc wrapping a short one
    scores ≥ threshold only in the short→long direction; two
    near-identical docs score in both directions (both rows emitted).

    Scale shape is identical to `jaccard_pairs`: one shuffle builds
    the shingle inverted index, pairs expand only inside buckets
    (docs meet solely on shared shingles — never all-pairs), ``max_df``
    caps hot-shingle buckets to bound the O(df²) in-bucket expansion,
    and each unordered candidate pair is scored once then emitted in
    whichever directions clear the threshold (no doubled join work).

    Output: (src_id, dst_id, containment) rounded 6, src ≠ dst.
    """
    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n), id_col, "shingle", max_df
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    # shuffle_hash: never let the corpus-growing pair frame become a
    # broadcast build side (rationale at jaccard_pairs)
    scored = inter.join(ca.hint("shuffle_hash"), "id_a").join(
        cb.hint("shuffle_hash"), "id_b"
    )
    # Emit both directions from ONE pass (r15 optimization): the old
    # a_in_b/b_in_a UNION re-executed the whole postings pipeline —
    # shingle explode, bucket shuffle, pair expansion, both joins —
    # once per branch (Catalyst does not CSE across union inputs).
    # A 2-element in-row explode scores each unordered pair once and
    # keeps whichever directions clear the threshold: identical row
    # set, half the work at any scale.
    both = F.array(
        F.struct(
            F.col("id_a").alias("src_id"),
            F.col("id_b").alias("dst_id"),
            (F.col("inter") / F.col("n_a")).alias("ratio"),
        ),
        F.struct(
            F.col("id_b").alias("src_id"),
            F.col("id_a").alias("dst_id"),
            (F.col("inter") / F.col("n_b")).alias("ratio"),
        ),
    )
    return (
        scored.select(F.explode(both).alias("r"))
        .where(F.col("r.ratio") >= threshold)
        .select(
            F.col("r.src_id").alias("src_id"),
            F.col("r.dst_id").alias("dst_id"),
            F.round(F.col("r.ratio"), 6).alias("containment"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = MINHASH_NUM
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) MinHash signatures.

    Each shingle's base hash x (32-bit md5 prefix) runs through the
    universal-hash family h_i(x) = ((2i+1)·x + 7919·i + 1) mod p; the
    per-doc signature is the element-wise minimum across shingles,
    computed as a single fold (aggregate + zip_with/least) over the
    collected per-doc hash list. The md5 hashing runs on exploded
    posting ROWS — whole-stage codegen — not inside the fold:
    higher-order functions are interpreted, so keeping per-element
    hashing out of them is ~3× faster even though the groupBy costs a
    shuffle (of pre-hashed longs, the smallest possible payload).
    No row×num_hashes explosion anywhere.
    """
    sh = shingle_postings(df, id_col, text_col, n).withColumn("x", hash32("shingle"))
    xs = sh.groupBy(id_col).agg(F.collect_list("x").alias("__xs"))
    harr = lambda x: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: ((2 * i + 1) * x + 7919 * i + 1) % F.lit(MINHASH_PRIME),
    )
    # One fold per doc: seed with +inf, zip_with/least against each
    # shingle's hash array; the collected list is bounded by the doc's
    # own shingle count (cap extremely long docs upstream).
    sig = F.aggregate(
        F.col("__xs"),
        F.array_repeat(F.lit(1 << 62).cast("long"), num_hashes),
        lambda acc, x: F.zip_with(acc, harr(x), lambda a, b: F.least(a, b)),
    )
    return xs.select(F.col(id_col), sig.alias("sig"))


def _band_keys(
    signatures: DataFrame,
    id_col: str,
    band_rows: int,
    num_hashes: int,
    with_sig_hash: bool = False,
) -> DataFrame:
    """(id, band, band_key[, _sig_h]) rows: each signature split into
    ``num_hashes/band_rows`` bands, key = joined in-band values.
    ``with_sig_hash`` also carries xxhash64 of the FULL signature —
    computed once per doc before the explode (the generator replicates
    it), so oversize routing needs no join back to the signatures."""
    n_bands = num_hashes // band_rows
    band = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), b * band_rows + 1, band_rows),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ).alias("key"),
            ),
        )
    )
    extra = [F.xxhash64("sig").alias("_sig_h")] if with_sig_hash else []
    return signatures.select(F.col(id_col), *extra, band.alias("bk")).select(
        F.col(id_col),
        *(["_sig_h"] if with_sig_hash else []),
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("band_key"),
    )


def _lsh_all_pairs_expr() -> Column:
    """All ordered pairs from a bucket's (sig-hash, id) struct array."""
    return F.filter(
        F.flatten(
            F.transform(
                F.col("ms"),
                lambda a: F.transform(
                    F.col("ms"),
                    lambda b: F.struct(
                        a["_mid"].alias("id_a"), b["_mid"].alias("id_b")
                    ),
                ),
            )
        ),
        lambda p: p["id_a"] < p["id_b"],
    )


def _lsh_chain_expr() -> Column:
    """Consecutive links within each identical-signature run of a
    bucket's sorted (sig-hash, id) struct array — linear routing for
    oversized buckets (see `lsh_candidate_pairs`)."""
    return F.transform(
        F.filter(
            F.zip_with(
                F.slice(F.col("ms"), 1, F.size("ms") - 1),
                F.slice(F.col("ms"), 2, F.size("ms") - 1),
                lambda x, y: F.struct(
                    x["_mid"].alias("id_a"),
                    y["_mid"].alias("id_b"),
                    (x["_sig_h"] == y["_sig_h"]).alias("_ok"),
                ),
            ),
            lambda p: p["_ok"],
        ),
        lambda p: F.struct(p["id_a"].alias("id_a"), p["id_b"].alias("id_b")),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    band_rows: int = MINHASH_BAND_ROWS,
    num_hashes: int = MINHASH_NUM,
    max_bucket: int | None = 100_000,
    oversize: str = "exact_chain",
) -> DataFrame:
    """Candidate pairs from banded LSH over MinHash signatures.

    Each signature array splits into num_hashes/band_rows bands; the
    band key is the joined in-band values. Docs collide iff a whole
    band matches: self-join on (band, key) → distinct pairs. Bucket
    sizes stay tiny for non-near-dup corpora, so the join is sparse —
    the full-corpus cross join never happens.

    ``max_bucket`` is the OOM guard for degenerate corpora (a band key
    shared by an exact-duplicate swarm): buckets larger than the cap
    never reach the quadratic in-bucket pair expansion. What happens
    to them instead is ``oversize``:

    - ``"exact_chain"`` (default): members of an oversized bucket are
      grouped by their FULL signature (the bucket collects
      (sig-hash, id) structs, so identical-signature members sort
      contiguous); each identical-signature run emits a CHAIN of
      consecutive links — n−1 pairs instead of n(n−1)/2, computed in
      the SAME projection as the small-bucket expansion, so the
      routing adds zero extra passes or shuffles. A real crawl's
      swarm buckets are exactly-duplicated boilerplate: every link
      joins two identical-signature docs (downstream verification
      always passes) and the chain keeps the whole swarm one
      connected component for clustering/keep-one (VERDICT r6 #5).
      What routing CANNOT preserve is any CROSS-signature pair inside
      an oversized bucket: chains never span sig groups, so when an
      oversized bucket holds more than one signature group (two
      co-bucketed near-identical swarms, or a swarm plus a straggler)
      every member of that bucket loses its cross-group candidates —
      only single-sig-group buckets are lossless.
      `lsh_oversize_stats` counts exactly those at-risk memberships
      as ``n_residual_memberships`` — measure it beside any capped
      run instead of capping silently.
    - ``"drop"``: the pre-r7 behavior — oversized buckets contribute
      no pairs at all.

    ``None`` disables the cap (and with it the routing).
    """
    if oversize not in ("exact_chain", "drop"):
        raise ValueError(f"unknown oversize policy {oversize!r}")
    routing = max_bucket is not None and oversize == "exact_chain"
    # With routing, each member's full-signature hash rides INTO the
    # bucket (one extra long per exploded row, hashed once per doc
    # pre-explode) so oversized buckets can link identical-signature
    # runs without a second signature pass or join.
    keys = _band_keys(
        signatures, id_col, band_rows, num_hashes, with_sig_hash=routing
    )
    if routing:
        member = F.struct(F.col("_sig_h"), F.col(id_col).alias("_mid"))
    else:
        member = F.struct(F.lit(0).alias("_sig_h"), F.col(id_col).alias("_mid"))
    # Bucket-collect instead of a self-join: one shuffle on the band
    # key, pairs expanded inside each (tiny) bucket array. A self-join
    # would recompute the whole signature pipeline on both branches
    # (Catalyst does not CSE across join inputs). sort_array orders by
    # (sig-hash, id): identical signatures contiguous for the chain,
    # ids still totally ordered for deterministic pairs.
    buckets = keys.groupBy("band", "band_key").agg(
        F.sort_array(F.collect_list(member)).alias("ms")
    )
    all_pairs = _lsh_all_pairs_expr()
    chain = _lsh_chain_expr()
    if max_bucket is None:
        pair_structs = all_pairs
    elif routing:
        pair_structs = F.when(
            F.size("ms") <= max_bucket, all_pairs
        ).otherwise(chain)
    else:  # drop
        # empty array typed FROM the pair expression itself, so the
        # branches agree for any id column type (a hardcoded long cast
        # would fail analysis for string ids — code-review r7 finding)
        pair_structs = F.when(
            F.size("ms") <= max_bucket, all_pairs
        ).otherwise(F.filter(all_pairs, lambda p: F.lit(False)))
    return (
        buckets.where(F.size("ms") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )


def lsh_candidate_pairs_by_cap(
    signatures: DataFrame,
    id_col: str,
    caps: "list[int | None]",
    band_rows: int = MINHASH_BAND_ROWS,
    num_hashes: int = MINHASH_NUM,
) -> "dict[int | None, DataFrame]":
    """`lsh_candidate_pairs` for SEVERAL ``max_bucket`` caps from ONE
    banding + bucket build — cap-sensitivity checks (the swarm guard,
    capacity tuning) would otherwise re-run the whole signature
    explode + bucket shuffle per cap. The shared bucket frame is a
    tracked persist (released per query); each cap differs only in
    its in-bucket expansion projection, exactly as in the
    single-cap operator (``exact_chain`` routing for oversized
    buckets; ``None`` = uncapped all-pairs)."""
    from real_time_data_pipeline_spark.operators.materialize import persist_tracked

    keys = _band_keys(
        signatures, id_col, band_rows, num_hashes, with_sig_hash=True
    )
    member = F.struct(F.col("_sig_h"), F.col(id_col).alias("_mid"))
    buckets = persist_tracked(
        keys.groupBy("band", "band_key").agg(
            F.sort_array(F.collect_list(member)).alias("ms")
        )
    )
    out: "dict[int | None, DataFrame]" = {}
    for cap in caps:
        if cap is None:
            pair_structs = _lsh_all_pairs_expr()
        else:
            pair_structs = F.when(
                F.size("ms") <= cap, _lsh_all_pairs_expr()
            ).otherwise(_lsh_chain_expr())
        out[cap] = (
            buckets.where(F.size("ms") > 1)
            .select(F.explode(pair_structs).alias("p"))
            .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
            .distinct()
        )
    return out


def lsh_oversize_stats(
    signatures: DataFrame,
    id_col: str,
    band_rows: int = MINHASH_BAND_ROWS,
    num_hashes: int = MINHASH_NUM,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """One-row accounting of what the ``max_bucket`` cap touches — the
    observability half of the "no silent caps" rule. Columns:

    - ``n_oversized_buckets`` / ``n_oversized_memberships``: buckets
      over the cap and their total member rows;
    - ``n_residual_memberships``: members of oversized buckets that
      hold MORE THAN ONE signature group. Chain routing links only
      within a sig group, so every member of a multi-group oversized
      bucket loses that bucket's cross-group candidates (ADVICE r7:
      two co-bucketed near-identical swarms lose every cross-swarm
      pair — counting only unique-sig members understated that).
      Members of single-group oversized buckets stay fully chained
      and are NOT residual.

    Run and log() this beside any capped `lsh_candidate_pairs` call;
    an unexpectedly large residual means the corpus needs a bigger cap
    or an upstream exact-dedup pass.
    """
    # sig hash carried through the banding projection — no second
    # signature pass or join back (code-review r7 finding)
    keys = _band_keys(
        signatures, id_col, band_rows, num_hashes, with_sig_hash=True
    )
    per_bucket = keys.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("n")
    )
    cap = F.lit(max_bucket) if max_bucket is not None else None
    if cap is None:
        return per_bucket.agg(
            F.lit(0).alias("n_oversized_buckets"),
            F.lit(0).alias("n_oversized_memberships"),
            F.lit(0).alias("n_residual_memberships"),
        )
    big = per_bucket.where(F.col("n") > cap).select("band", "band_key", "n")
    sig_groups = (
        keys.join(big.select("band", "band_key"), ["band", "band_key"], "left_semi")
        .groupBy("band", "band_key", "_sig_h")
        .agg(F.count(F.lit(1)).alias("g"))
    )
    bucket_groups = sig_groups.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("n_groups"), F.sum("g").alias("n_members")
    )
    residual = bucket_groups.where(F.col("n_groups") > 1).agg(
        F.coalesce(F.sum("n_members"), F.lit(0)).alias("n_residual_memberships")
    )
    totals = big.agg(
        F.count(F.lit(1)).alias("n_oversized_buckets"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_oversized_memberships"),
    )
    return totals.crossJoin(F.broadcast(residual))


# SimHash width. 60 bits = 15 md5 hex chars: wide enough that band
# buckets stay sparse at billion-doc scale (32-bit signatures collide
# heavily there), while every intermediate — the hash itself, 1<<59,
# and the signature sum — stays strictly below 2^63, so the identical
# arithmetic runs in DuckDB's signed BIGINT for the oracle.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 15  # 4 bands × 15 bits; pigeonhole-complete ≤ 3 flips


def simhash_signature(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """``bits``-wide SimHash over distinct words (md5-derived votes).

    For each word hash h, bit j votes +1 if set else −1; the signature
    sets bit j iff the vote sum is positive. One explode over
    (word × bits) then two groupBys — every step (md5, shifts, sums)
    is whole-stage codegen, which beats an in-row fold here:
    higher-order functions are interpreted, so folding the votes
    in-row runs ~4× slower than exploding codegen rows (measured at
    sf0.1). Per-doc word dedup is in-row (`array_distinct`), so no
    global distinct shuffle. ``bits`` must stay ≤ 60 so every
    intermediate fits signed BIGINT on both engines (the word hash is
    the first ceil(bits/4) md5 hex chars).
    """
    if bits > 60:
        raise ValueError("simhash_signature: bits > 60 overflows signed BIGINT")
    hex_chars = (bits + 3) // 4
    h = F.conv(F.substring(F.md5(F.col("word")), 1, hex_chars), 16, 10).cast("long")
    w = _fan_out(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, 1))).alias("word"),
    ).withColumn("h", h)
    bits_df = w.select(
        F.col(id_col),
        F.col("h"),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
    )
    # shiftright/shiftleft with a column shift amount need the SQL form
    vote = F.when(F.expr("shiftright(h, CAST(j AS INT)) & 1") == 1, 1).otherwise(-1)
    per_bit = bits_df.groupBy(id_col, "j").agg(F.sum(vote).alias("v"))
    bit_val = F.when(
        F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")
    ).otherwise(F.lit(0).cast("long"))
    return per_bit.groupBy(id_col).agg(F.sum(bit_val).alias("simhash"))


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash (compat shim over `simhash_signature`)."""
    return simhash_signature(df, id_col, text_col, bits=32)


# ---------------------------------------------------------------------------
# Embedding similarity
# ---------------------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns (sequential HOF fold).

    Measured note (r16): a statically UNROLLED 64-term expression
    (bit-identical left fold) was prototyped against this form on the
    centroid-assignment path and ran 3.5× SLOWER (isolated A/B at
    sf0.1, 2.44 s vs 0.70 s): the 192-node expression tree blows the
    generated method past JIT limits and the stage falls back to
    interpreted evaluation of every node, which loses to the HOF
    fold's one interpreted loop. Keep the fold."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """Euclidean norm of an array<double> column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns (codegen, exact).

    For pairwise joins prefer precomputing `norm` ONCE per row and
    using ``dot(a, b) / (na * nb)`` — bit-identical doubles (same
    operations, same order), at a third of the per-pair cost.
    """
    return dot(a, b) / (norm(a) * norm(b))


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
    v = _fan_out(
        df.select(
            F.col(id_col), F.col(block_col), F.col(vec_col).cast("array<double>").alias("v")
        ),
        block_col,
    ).withColumn("nv", norm(F.col("v")))  # once per vector, not per pair
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(block_col), F.col("v").alias("va"), F.col("nv").alias("na")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(block_col).alias("__blk"), F.col("v").alias("vb"),
        F.col("nv").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
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
    ).withColumn("nq", norm(F.col("qv")))
    c = _fan_out(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
        )
    ).withColumn("nc", norm(F.col("cv")))
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))
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
    df: DataFrame,
    vec_col: str,
    num_planes: int = 8,
    seed_tag: str = "plane",
    dim: int | None = None,
) -> Column:
    """Random-hyperplane LSH bucket id (0 .. 2^num_planes − 1).

    Plane components are deterministic md5-derived integers in
    [−500, 500), so the bucketing is reproducible anywhere (including
    SQL). Vectors in the same bucket agree on the sign of num_planes
    random projections — the standard sub-linear candidate generator
    for cosine ANN.

    Pass ``dim`` (the vector width) whenever it is known: omitting it
    probes the width from the data, which costs one Spark job at
    plan-build time — a hidden action inside what looks like pure
    column construction.
    """
    import hashlib

    def plane_component(j: int, d: int) -> float:
        # md5("plane-j-d") first 8 hex → int in [-500, 500); identical
        # to the SQL form ('0x'||substr(md5(...),1,8))::BIGINT % 1000 - 500
        h = int(hashlib.md5(f"{seed_tag}-{j}-{d}".encode()).hexdigest()[:8], 16)
        return float(h % 1000 - 500)

    if dim is None:
        # Probe the vector width (plan-build-time Spark job). Skip NULL
        # vectors and fail with a clear message on an empty/all-NULL
        # input instead of the bare TypeError first()[0] would raise.
        probe = df.where(F.col(vec_col).isNotNull()).select(F.col(vec_col)).first()
        if probe is None:
            raise ValueError(
                f"hyperplane_lsh_bucket: cannot infer vector width from an "
                f"empty or all-NULL '{vec_col}' column — pass dim= explicitly"
            )
        dim = len(probe[0])
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    # Plane components are BAKED IN as literal arrays at plan-build
    # time (the md5 math runs once in Python, not per row×dim×plane on
    # the cluster) — same deterministic values the SQL oracle derives.
    for j in range(num_planes):
        plane = F.array(*[F.lit(plane_component(j, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components over an undirected pair graph (iterative
    min-label propagation) — the transitive-closure step that turns
    near-dup PAIRS into dedup CLUSTERS with one canonical id each.

    Each iteration: every node takes the minimum label among itself
    and its neighbors, then follows its label's label once (pointer
    jumping — labels race down chains in O(log diameter) rounds
    instead of one hop per round); a checkpoint truncates the growing
    plan between iterations; the loop stops when no label changes (or
    at ``max_iter``). For planet-scale graphs
    `connected_components_star` additionally SHRINKS the edge set as
    it contracts; the fixpoint-loop shape is the same.

    ``checkpoint_dir`` selects durability: None → ``reliable_materialize``
    (the session-level checkpoint dir if one is set, else
    executor-local blocks — fastest, right for a single-node or short
    local run, but an executor loss kills the lineage-truncated data).
    On a cluster pass an HDFS/object-store path (or set the session
    checkpoint dir): iterations then use reliable ``checkpoint()``
    files that survive executor loss.

    Output: (<id_a> → node, cluster_id = min node id in component).
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else reliable_materialize(df)

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = _ckpt(
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    )
    labels = _ckpt(
        edges.select(F.col("src").alias("node")).distinct().withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        # The old label is already in this join, so the convergence
        # flag rides along — one action per iteration (the checkpoint
        # materialization), no separate old-vs-new join.
        stepped = labels.join(nbr_min, labels["node"] == nbr_min["src"], "left").select(
            F.col("node"),
            F.col("comp").alias("__prev"),
            F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                "comp"
            ),
        )
        # Pointer jumping: follow the label's own label once, so a min
        # travels 2^k hops after k rounds instead of k (every comp id
        # IS some node's id, so the self-join always resolves). The
        # convergence flag compares against the pre-step label AFTER
        # the jump — a jump-only change must not end the loop early.
        ptr = stepped.select(
            F.col("node").alias("__p_node"), F.col("comp").alias("__p_comp")
        )
        new_labels = (
            stepped.join(ptr, stepped["comp"] == ptr["__p_node"], "left")
            .select(
                "node",
                F.coalesce(F.col("__p_comp"), F.col("comp")).alias("comp"),
                (F.coalesce(F.col("__p_comp"), F.col("comp")) != F.col("__prev")).alias(
                    "__chg"
                ),
            )
        )
        new_labels = _ckpt(new_labels)
        changed = new_labels.where(F.col("__chg")).count()  # on materialized data
        labels = new_labels.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_a), F.col("comp").alias("cluster_id"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the planet-scale alternative to min-label propagation.

    Min-label propagation needs O(diameter) rounds and keeps the full
    edge set live every round; star contraction converges in
    O(log² n) rounds and SHRINKS the edge set as it goes (every round
    rewires nodes directly at their neighborhood minimum), so late
    rounds touch a fraction of the data. Same output contract as
    `connected_components`:

    - large-star: each node's neighbors LARGER than it re-attach to
      its neighborhood minimum (including itself);
    - small-star: each node and its not-larger neighbors re-attach to
      that minimum.

    Both steps are one groupBy-collect each — per-node neighborhoods,
    the same bounded-bucket shape as the LSH steps. The loop stops
    when the edge set is stable (count + order-insensitive hash, one
    action per iteration on checkpointed data).

    Output: (<id_a> → node, cluster_id = min node id in component).
    """
    if checkpoint_dir is not None:
        pairs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if checkpoint_dir else reliable_materialize(df)

    def _sig(df: DataFrame) -> tuple[int, int]:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-insensitive, overflow-free under ANSI mode
            # (the rows are distinct, so no self-cancellation).
            F.coalesce(
                F.bit_xor(F.xxhash64(F.struct(F.col("a"), F.col("b")))), F.lit(0)
            ).alias("h"),
        ).first()
        return row.n, row.h

    e = _ckpt(
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    # Node set from the CHECKPOINTED edges, not `pairs` — deriving it
    # from pairs would re-run the (possibly expensive) upstream plan
    # once more at the final action.
    nodes = e.select(F.col("a").alias("node")).union(
        e.select(F.col("b").alias("node"))
    ).distinct()
    sig = None  # first comparison happens after one contraction round
    for _ in range(max_iter):
        # Large-star over the bidirected neighborhoods.
        bidir = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        nb = bidir.groupBy("a").agg(F.collect_set("b").alias("ns"))
        m = F.array_min(F.array_union(F.col("ns"), F.array(F.col("a"))))
        large = (
            nb.select(
                m.alias("m"),
                F.explode(F.filter(F.col("ns"), lambda v: v > F.col("a"))).alias("v"),
            )
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # Small-star: attach each edge to its max endpoint, then point
        # that node and its smaller neighbors at the minimum.
        canon = large.select(
            F.greatest(F.col("a"), F.col("b")).alias("a"),
            F.least(F.col("a"), F.col("b")).alias("b"),
        )
        nb2 = canon.groupBy("a").agg(F.collect_set("b").alias("ns"))
        m2 = F.array_min(F.col("ns"))  # all neighbors here are < a
        small = (
            nb2.select(
                m2.alias("m"),
                F.explode(F.array_union(F.col("ns"), F.array(F.col("a")))).alias("v"),
            )
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        e = _ckpt(small)
        new_sig = _sig(e)
        if new_sig == sig:
            break
        sig = new_sig
    # At the fixpoint every non-minimum node has exactly the edge
    # (node, component-min); minima (and any isolated inputs) label
    # themselves.
    return (
        nodes.join(e, nodes["node"] == e["a"], "left")
        .select(
            F.col("node").alias(id_a),
            F.coalesce(F.col("b"), F.col("node")).alias("cluster_id"),
        )
    )


# Codebook-size bound shared by every stride-seeded index family
# (IVF / k-means centroid count, PQ per-subspace codewords): seeding
# takes each stride-th id BELOW stride*k_max, so the codebook stays a
# FIXED size at any corpus scale instead of growing ~n/stride. The
# unbounded form made the corpus x codebook assignment join quadratic
# in corpus size — caught empirically by the r13 scaling curve
# (embed_pq_adc_topk x3->x10 leg exponent 1.31 against a documented
# linear bound) — while real IVF/PQ deployments always fix nlist /
# codebook size up front. Test corpora (max vec_id 1999 at sf0.1) sit
# far below stride*k_max for every family, so small-SF results are
# bit-identical with or without the cap; production tunes k_max per
# corpus (it is a plain argument on every seeded operator).
CENTROID_K_MAX = 256


def stride_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    stride: int = 29,
    k_max: int = CENTROID_K_MAX,
) -> DataFrame:
    """Deterministic seed centroids: every ``stride``-th corpus id
    below ``stride * k_max`` (at most ``k_max`` seeds — see
    CENTROID_K_MAX for why the count must not scale with the corpus).

    (cent_id, cvec) — the zero-training IVF baseline, and the seed set
    for `kmeans_centroids`.
    """
    return corpus.where(
        ((F.col(id_col) % stride) == 0) & (F.col(id_col) < stride * k_max)
    ).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).cast("array<double>").alias("cvec")
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    stride: int = 29,
    iters: int = 2,
    quant: int = 1_000_000,
) -> DataFrame:
    """Deterministic k-means (fixed Lloyd iterations, stride-seeded).

    Stride centroids are arbitrary points; real embeddings cluster, so
    trained centroids concentrate inverted lists and raise IVF recall
    (`embed_ann_kmeans_recall` measures exactly this). Every step is
    reproducible bit-for-bit on any engine/partitioning:

    - assignment: exact cosine, ties broken by cent_id;
    - centroid update: the mean runs over integer-QUANTIZED
      components — sum(floor(x·quant + 0.5)) / (quant · n). Integer
      sums are associative, so the result is independent of Spark's
      partial-aggregation order, and one final double division gives
      the identical IEEE value DuckDB computes — a float sum would
      diverge in the low bits and flip borderline assignments.

    Per iteration: one broadcast-assign over the corpus (map-side
    max_by — the corpus never shuffles) + one (cent, dim)-keyed
    partial aggregate of quantized longs. Empty clusters drop (k may
    shrink); `reliable_materialize` truncates the iteration lineage.
    Component sums stay exact below 2^53 per (cluster, dim) — at
    |cluster|·quant beyond that, lower ``quant``.

    Output: (cent_id, cvec) — feed to `ivf_topk(centroids=...)`.
    """
    # _fan_out BEFORE the checkpoint: the cached blocks inherit the
    # partitioning, so every broadcast-assign iteration runs full-width
    # instead of funneling the whole corpus×centroid cross through the
    # single task a one-file input would otherwise produce.
    rows = _fan_out(
        corpus.select(
            F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("cv")
        )
    ).withColumn(
        "qv", F.transform(F.col("cv"), lambda x: F.floor(x * quant + F.lit(0.5)).cast("long"))
    )
    rows = reliable_materialize(rows)
    cents = stride_centroids(corpus, id_col, vec_col, stride)
    for it in range(iters):
        c = cents.withColumn("nc", norm(F.col("cvec")))
        nv = norm(F.col("cv"))
        scored = rows.crossJoin(F.broadcast(c)).select(
            "nid", "qv", "cent_id",
            (dot(F.col("cv"), F.col("cvec")) / (nv * F.col("nc"))).alias("__ccos"),
        )
        best = F.max_by(
            F.col("cent_id"),
            F.struct(F.col("__ccos").alias("c"), (-F.col("cent_id")).alias("t")),
        )
        assign = scored.groupBy("nid").agg(best.alias("cent_id"), F.first("qv").alias("qv"))
        comp = F.col("s").cast("double") / (F.lit(float(quant)) * F.col("n").cast("double"))
        cents = (
            assign.select("cent_id", F.posexplode("qv").alias("pos", "q"))
            .groupBy("cent_id", "pos")
            .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
            .select("cent_id", "pos", comp.alias("comp"))
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                    lambda s: s["comp"],
                ).alias("cvec")
            )
        )
        # Intermediate centroids feed exactly ONE next-iteration
        # broadcast, so lineage chaining is fine; only the FINAL
        # centroid frame is materialized — `ivf_topk` references it
        # twice (index build + probe) and must not re-run training.
        if it == iters - 1:
            cents = reliable_materialize(cents)
    return cents


def assign_to_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, centroids: DataFrame
) -> DataFrame:
    """Nearest-centroid assignment: (nid, cent_id, cv, nv) per vector.

    The shared index-build step for IVF search and SemDeDup pruning.
    Centroids are tiny by construction → broadcast cross join; the
    per-vector argmax collapses MAP-SIDE via one max_by aggregate (the
    exchange moves |corpus| rows, not |corpus|·n_centroids — a
    row_number window would shuffle the scored rows first). Tie-break:
    max cos, then min cent_id, making the assignment unique and
    engine-independent.
    """
    cents = centroids.withColumn("nc", norm(F.col("cvec")))
    corpus_rows = _fan_out(
        corpus.select(
            F.col(id_col).alias("nid"), F.col(vec_col).cast("array<double>").alias("cv")
        )
    ).withColumn("nv", norm(F.col("cv")))
    scored = corpus_rows.crossJoin(F.broadcast(cents)).select(
        "nid", "cv", "nv", "cent_id",
        (dot(F.col("cv"), F.col("cvec")) / (F.col("nv") * F.col("nc"))).alias("__ccos"),
    )
    best = F.max_by(
        F.struct(F.col("cent_id"), F.col("cv"), F.col("nv")),
        F.struct(F.col("__ccos").alias("c"), (-F.col("cent_id")).alias("t")),
    )
    return (
        scored.groupBy("nid").agg(best.alias("__b"))
        .select(
            "nid",
            F.col("__b.cent_id").alias("cent_id"),
            F.col("__b.cv").alias("cv"),
            F.col("__b.nv").alias("nv"),
        )
    )


def semdedup_prune(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    threshold: float,
) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster, then prune within-cluster
    near-duplicates (arXiv:2303.09540's recipe, re-expressed as a plan).

    A vector survives iff NO lower-id vector in its k-means cluster has
    cosine ≥ ``threshold`` to it — the deterministic one-pass variant of
    greedy pruning (it can only drop MORE than the greedy sweep, never
    fewer; a dropped anchor still shadows its own near-dups). Pairwise
    cost is quadratic only INSIDE a cluster: with k ≈ √n trained
    centroids, expected cluster size is √n, so the candidate join stays
    ~O(n) pairs per list and shuffles on cent_id — never an all-pairs
    corpus join.

    Output: (<id_col>, cent_id) — the surviving vectors with their
    cluster, ready to anti-join the embedding store.
    """
    # Referenced twice (both sides of the in-cluster self-join) —
    # materialize so training + assignment run once.
    assign = reliable_materialize(assign_to_centroids(corpus, id_col, vec_col, centroids))
    a = assign.select(
        "cent_id", F.col("nid").alias("id_a"), F.col("cv").alias("va"), F.col("nv").alias("na")
    )
    b = assign.select(
        F.col("cent_id").alias("__c"), F.col("nid").alias("id_b"),
        F.col("cv").alias("vb"), F.col("nv").alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    shadowed = (
        a.join(b, (F.col("cent_id") == F.col("__c")) & (F.col("id_b") < F.col("id_a")))
        .where(cos >= threshold)
        .select(F.col("id_a").alias("nid"))
        .distinct()
    )
    return assign.join(shadowed, "nid", "left_anti").select(
        F.col("nid").alias(id_col), "cent_id"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    centroid_stride: int = 29,
    nprobe: int = 3,
    centroids: DataFrame | None = None,
    assignment: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors.

    The scale path past brute force: (1) pick deterministic centroids
    (``centroids`` — e.g. `kmeans_centroids`; default: stride seeds —
    determinism is what the oracle needs); (2) assign each corpus
    vector to its nearest centroid — the inverted lists; (3) per
    query, probe only the `nprobe` nearest lists and rank candidates
    within them. Search cost drops from O(|corpus|) to
    O(|corpus| · nprobe / n_lists) per query.

    Plan at scale: centroids are tiny → both the assignment pass and
    the probe pass are broadcast joins (the corpus never shuffles to
    build lists); the candidate join shuffles on list id, so lists ≈
    √n keeps partitions balanced; per-query top-k is a row_number
    window over candidates only. All ranking tie-breaks on id, and
    each corpus vector lives in exactly one list, so no dedup step.

    Output: (query_id, neighbor_id, cos, rk) — same shape as
    `ann_brute_topk` for recall measurement against the exact answer.
    """
    from pyspark.sql import Window

    # Norms precompute ONCE per vector (same doubles cosine() would
    # produce per pair — bit-identical to the oracle, 3× cheaper).
    if centroids is None:
        centroids = stride_centroids(corpus, id_col, vec_col, centroid_stride)
    cents = centroids.withColumn("nc", norm(F.col("cvec")))
    # A caller sweeping nprobe (or issuing many query batches) passes
    # the materialized assignment once — the index build is the
    # expensive corpus pass; probing is the cheap part.
    assign = (
        assignment
        if assignment is not None
        else assign_to_centroids(corpus, id_col, vec_col, centroids)
    )

    # Queries are small → a row_number window over their probe scores
    # is cheap and keeps the top-nprobe lists per query.
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("nq", norm(F.col("qv")))
    qscored = qrows.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "nq", "cent_id",
        (dot(F.col("qv"), F.col("cvec")) / (F.col("nq") * F.col("nc"))).alias("__ccos"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("__ccos"), F.asc("cent_id"))
    probes = (
        qscored.withColumn("__crk", F.row_number().over(wq))
        .where(F.col("__crk") <= nprobe)
        .drop("__ccos", "__crk")
    )
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nv"))
    # The probe set is |queries|·nprobe rows → broadcast it: the
    # corpus-side inverted lists are filtered in place, never shuffled.
    cand = (
        assign.join(F.broadcast(probes), "cent_id")
        .where(F.col("nid") != F.col("query_id"))
        .select("query_id", F.col("nid").alias("neighbor_id"), cos.alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk")
    )


def simhash_band_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    n_bands: int = SIMHASH_BANDS,
    band_bits: int = SIMHASH_BAND_BITS,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs from SimHash signatures via band buckets.

    Candidates meet only when one `band_bits`-bit slice of their
    signatures matches exactly (pigeonhole: any pair within
    `n_bands - 1` bit flips shares at least one intact band, so
    max_hamming < n_bands has NO false negatives); the exact Hamming
    check then filters false positives with one xor+bit_count — the
    same bucket-join shape as MinHash-LSH, corpus-size independent.
    Defaults cover the 60-bit signature as 4×15-bit bands — 32k
    distinct values per band keeps buckets sparse at corpus scale.

    Output: (id_a, id_b, hamming) with id_a < id_b.
    """
    mask = (1 << band_bits) - 1
    band_arr = F.array(
        *[
            F.shiftright(F.col(sig_col), band_bits * j).bitwiseAND(F.lit(mask))
            for j in range(n_bands)
        ]
    )
    bands = sigs.select(F.col(id_col), F.col(sig_col), F.posexplode(band_arr).alias("b", "k"))
    a = bands.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("sa"), "b", "k"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("sb"),
        F.col("b").alias("__b"), F.col("k").alias("__k"),
    )
    cand = (
        a.join(b, (F.col("b") == F.col("__b")) & (F.col("k") == F.col("__k")))
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.where(ham <= max_hamming).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )


def quantize_embedding(vec: Column, levels: int = 255) -> Column:
    """Per-vector scalar quantization to ``levels`` integer steps.

    Returns struct(lo, scale, q: array<int>): x ≈ lo + q·scale. With
    the default levels=255 the codes span 0..255 — a uint8/byte-range
    code (store as unsigned byte, or pass levels=254 and offset by
    −128 if the store must be SIGNED int8). One byte per dimension
    cuts an embedding store to ~1/4 of its float32 footprint (1/8 of
    float64) — at 100 TB of vectors the difference between an
    in-memory ANN tier and one that pages. All
    arithmetic (min/max fold, floor) is deterministic and
    SQL-replicable, so quantized search results remain oracle-checkable.
    Degenerate constant vectors get scale 0 and q=0 (dequantize back
    to the constant exactly).
    """
    v = vec.cast("array<double>")
    lo = F.array_min(v)
    hi = F.array_max(v)
    scale = (hi - lo) / F.lit(float(levels))
    q = F.transform(
        v,
        lambda x: F.when(scale > 0, F.floor((x - lo) / scale))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    # floor can emit `levels` itself only when x == hi exactly; clamp.
    q = F.transform(q, lambda c: F.least(c, F.lit(levels)).cast("int"))
    return F.struct(lo.alias("lo"), scale.alias("scale"), q.alias("q"))


def dequantize_embedding(qs: Column) -> Column:
    """Inverse of `quantize_embedding`: lo + q·scale as array<double>."""
    return F.transform(
        qs["q"], lambda c: qs["lo"] + c.cast("double") * qs["scale"]
    )


def winnowing_postings(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 4
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every word ``k``-gram, slide
    a window of ``w`` consecutive hashes, keep each window's minimum.

    Guarantees: any shared run of ``w + k - 1`` words between two docs
    yields at least one shared fingerprint, and only ~2/(w+1) of the
    grams are kept — position-robust SUBSTRING matching at a fraction
    of full-shingle cost, complementing the set-based MinHash family.

    Plan shape: NO higher-order functions anywhere. Words explode from
    a plain codegen split; the k-gram is assembled by ``lead()`` window
    calls and the sliding minimum by a w-row window frame — BOTH over
    the same (id, pos) shuffle+sort, so the whole selection is one
    exchange. (The obvious in-row shingle-transform build measured
    ~25x slower here: Catalyst inlines the interpreted transform into
    the Generate's pushed-down size/notnull pre-filter on the
    pre-repartition side, where it re-evaluates the split per element
    on a single task.) Docs shorter than ``w`` grams contribute their
    global-min hash (the single truncated window), so every doc with
    >= ``k`` words gets at least one fingerprint. Per-doc windowing
    means one task per doc: cap or chunk pathological multi-million-
    word docs upstream, as the quality gates already do.

    Output: (id, fp) — MAY repeat a fingerprint chosen by several
    windows; `winnowing_fingerprints` is the distinct view, and
    `winnowing_pairs` folds the dedup into its bucket build instead.
    """
    from pyspark.sql import Window

    from real_time_data_pipeline_spark.operators.text import hash60, words

    base = _fan_out(df.select(F.col(id_col), F.col(text_col)), id_col).select(
        F.col(id_col), F.posexplode(words(text_col)).alias("pos", "__w")
    )
    seq = Window.partitionBy(id_col).orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("__w"), *[F.lead("__w", i).over(seq) for i in range(1, k)]
    )
    # A gram is complete iff its last word exists (lead returns NULL
    # past the partition end; concat_ws would silently drop it).
    grams = (
        base.select(
            F.col(id_col),
            "pos",
            gram.alias("gram"),
            F.lead("__w", k - 1).over(seq).isNotNull().alias("__ok"),
        )
        .where(F.col("__ok"))
        .select(F.col(id_col), "pos", hash60(F.col("gram")).alias("__h"))
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    )
    n_grams = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    return (
        grams.select(
            F.col(id_col),
            "pos",
            F.min("__h").over(frame).alias("fp"),
            n_grams.alias("__ng"),
        )
        # complete windows only; a short doc keeps its pos-0 truncated
        # window (frame clips at the partition end -> global min).
        .where(F.col("pos") <= F.greatest(F.col("__ng") - w, F.lit(0)))
        .select(F.col(id_col), "fp")
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 4
) -> DataFrame:
    """Distinct winnowing fingerprints per doc: (id, fp)."""
    return winnowing_postings(df, id_col, text_col, k, w).distinct()


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs by shared winnowing fingerprints.

    Same inverted-index discipline as `jaccard_pairs`: docs meet only
    inside a fingerprint bucket, `max_df` drops degenerate hot
    fingerprints (bounding per-bucket pair expansion at max_df²), and
    the postings dedup is folded into the bucket build (collect_set)
    so the whole candidate generation is ONE shuffle on the
    fingerprint. ``min_shared`` >= 2 demands two independent shared
    windows — the usual knob against single-hash collisions.

    Output: (id_a, id_b, n_shared) with id_a < id_b.
    """
    inter, _ = _bucketed_pair_counts(
        winnowing_postings(df, id_col, text_col, k, w),
        id_col,
        "fp",
        max_df,
        distinct_ids=True,  # postings repeat (id, fp); dedup in the bucket build
        with_counts=False,  # no denominators needed -> no persist, pure one-pass
    )
    return inter.withColumnRenamed("inter", "n_shared").where(
        F.col("n_shared") >= min_shared
    )


def shared_gram_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_shared: int = 2,
    max_df: int | None = 50,
) -> DataFrame:
    """Pairs sharing >= ``min_shared`` distinct word ``n``-grams — the
    exact long-substring overlap signal (boilerplate headers, quoted
    passages, templated spans) next to Jaccard/winnowing near-dup.

    Same inverted-index core as the rest of the pair family
    (`_bucketed_pair_counts`): one shuffle on the gram builds the
    buckets, ``max_df`` drops hot grams, pairs expand in-row inside
    buckets. Introduced r14 to REPLACE a raw postings self-join whose
    build side Catalyst chose to BROADCAST (an ExistingRDD with no
    stats — the corpus-token-sized postings frame as a broadcast
    relation, instant death at scale; the same hazard class the
    cap-tradeoff harness caught in the counts joins). The bucket form
    is value-identical, one shuffle cheaper, and needs no
    materialization at all.

    Output: (id_a, id_b, n_shared_grams) with id_a < id_b.
    """
    inter, _ = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n),
        id_col,
        "shingle",
        max_df,
        with_counts=False,  # no denominators -> no persist, pure one-pass
    )
    return inter.withColumnRenamed("inter", "n_shared_grams").where(
        F.col("n_shared_grams") >= min_shared
    )


def cross_jaccard_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ACROSS two corpora — one side per
    pair, never within a side. The batch form of incremental dedup:
    `left` is the arriving batch, `right` the accepted corpus, and a
    left doc matching any right doc is a duplicate arrival.

    Same inverted-index discipline as `jaccard_pairs`, with BOTH
    sides' postings in one bucket build (side-tagged union, one
    shuffle on the shingle): pair expansion is ids_a x ids_b inside a
    bucket, `max_df` caps the COMBINED bucket size, and both sides'
    per-doc shingle counts fall out of the same materialized buckets.
    At 100 TB the accepted side dominates; the expansion stays bounded
    because an arriving batch contributes few ids per bucket.

    Output: (id_a from left, id_b from right, jaccard) rounded 6.
    Callers must ensure the two id spaces are disjoint (or carry a
    side prefix) — ids are compared only for output, never to split
    sides.
    """
    la = shingle_postings(left, id_col, text_col, n).withColumn("__s", F.lit("a"))
    rb = shingle_postings(right, id_col, text_col, n).withColumn("__s", F.lit("b"))
    buckets = (
        la.unionByName(rb)
        .groupBy("shingle")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("__s") == "a", F.col(id_col)))
            ).alias("ids_a"),
            F.sort_array(
                F.collect_list(F.when(F.col("__s") == "b", F.col(id_col)))
            ).alias("ids_b"),
        )
    )
    if max_df is not None:
        buckets = buckets.where(F.size("ids_a") + F.size("ids_b") <= max_df)
    # persist, not checkpoint (r15 optimization): three consumers
    # (ca, cb, inter) share one lazy tracked persist — same plan as
    # `_bucketed_pair_counts`' bucket cache, no eager job, no disk
    # round-trip, executor loss recomputes via lineage.
    buckets = persist_tracked(buckets)
    ca = (
        buckets.select(F.explode("ids_a").alias("id_a"))
        .groupBy("id_a")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    cb = (
        buckets.select(F.explode("ids_b").alias("id_b"))
        .groupBy("id_b")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids_a"),
            lambda x: F.transform(
                F.col("ids_b"), lambda y: F.struct(x.alias("id_a"), y.alias("id_b"))
            ),
        )
    )
    inter = (
        buckets.where((F.size("ids_a") >= 1) & (F.size("ids_b") >= 1))
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    # shuffle_hash: never let the corpus-growing pair frame become a
    # broadcast build side (rationale at jaccard_pairs)
    return (
        inter.join(ca.hint("shuffle_hash"), "id_a")
        .join(cb.hint("shuffle_hash"), "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def covariance_partials(
    df: DataFrame, vec_col: str, dim: int
) -> DataFrame:
    """Per-Arrow-batch partial covariance sums via ``mapInPandas`` —
    the distributed-linear-algebra pattern: each Python call reduces
    its whole batch to ONE d×d partial (`X.T @ X` in numpy), so the
    shuffle carries d²-sized partials per batch instead of row data,
    and the final combine is a plain sum aggregate keyed on (i, j).

    Output rows: (i, j, sxy, n) for the upper triangle i ≤ j (1-based
    dims); callers divide by total n and subtract means for the
    covariance. Never row-at-a-time: one BLAS call per batch.
    """
    import numpy as np
    import pandas as pd

    iu = None

    def partials(batches):
        nonlocal iu
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            S = X.T @ X
            if iu is None:
                iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": iu[0] + 1,
                    "j": iu[1] + 1,
                    "sxy": S[iu],
                    "n": np.full(len(iu[0]), len(pdf), dtype="int64"),
                }
            )

    return df.select(vec_col).mapInPandas(
        partials, schema="i int, j int, sxy double, n long"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): per-subspace codebooks + ADC search
# ---------------------------------------------------------------------------


def _pq_subvectors(df: DataFrame, id_col: str, vec_col: str, m_sub: int, sub_dim: int) -> DataFrame:
    """(id, m, s): the vector split into ``m_sub`` contiguous
    ``sub_dim``-wide double subvectors (float32 inputs are cast to
    double BEFORE any arithmetic, the cross-engine quantization rule)."""
    arr = F.col(vec_col).cast("array<double>")
    pieces = F.array(
        *[
            F.struct(
                F.lit(mi).alias("m"),
                F.slice(arr, mi * sub_dim + 1, sub_dim).alias("s"),
            )
            for mi in range(m_sub)
        ]
    )
    return df.select(F.col(id_col).alias("nid"), F.inline(pieces))


def _pq_qd2(a: Column, b: Column, quant: int) -> Column:
    """Quantized squared L2 distance between two double arrays: the
    element fold runs left-to-right (same order as DuckDB's
    list_sum-over-list_transform), then one floor-quantization makes
    every downstream comparison and sum integer-exact."""
    d2 = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.floor(d2 * quant + F.lit(0.5)).cast("long")


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int = 4,
    sub_dim: int = 16,
    stride: int = 63,
    iters: int = 1,
    quant: int = 1_000_000,
    k_max: int = CENTROID_K_MAX,
) -> DataFrame:
    """Deterministic product-quantization codebooks: an independent
    small k-means per SUBSPACE (every ``stride``-th vector's
    subvector below ``stride * k_max`` seeds subspace m's codebook —
    at most ``k_max`` codewords, the fixed PQ codebook size; fixed
    Lloyd iterations).

    PQ is the memory-side ANN index family (IVF prunes WHICH vectors
    to score; PQ compresses HOW each vector is scored): a D-dim float
    vector becomes ``m_sub`` one-byte-ish codes, so a 100 TB embedding
    store's search structure fits a fraction of the space and distance
    evaluation becomes table lookups (`pq_adc_topk`).

    Every step follows the `kmeans_centroids` determinism recipe —
    assignment by QUANTIZED squared L2 (min_by, ties to the lower
    cent_id; integer comparison, no float-order sensitivity), centroid
    update as an integer-quantized component mean (associative sums →
    partial-aggregation-order independent) — so a SQL engine replays
    the identical codebook. Empty codewords drop; per-subspace k may
    shrink.

    Scale: codebooks are tiny (m_sub·k rows) → every assignment pass
    is a broadcast join collapsed map-side by min_by; the corpus
    never shuffles during training. One (m, cent, pos)-keyed partial
    aggregate of longs per iteration.

    Output: (m, cent_id, cvec: array<double>).
    """
    return _pq_train(
        corpus, id_col, vec_col, m_sub, sub_dim, stride, iters, quant, k_max
    )[0]


def _pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m_sub: int,
    sub_dim: int,
    stride: int,
    iters: int,
    quant: int,
    k_max: int = CENTROID_K_MAX,
) -> "tuple[DataFrame, DataFrame]":
    """(codebooks, materialized subvector frame) — the frame is
    returned so the encode pass (`pq_adc_topk`) reuses the SAME
    corpus × m_sub explode the training pass already paid for and
    materialized, instead of rebuilding it from a second corpus
    scan."""
    subs = reliable_materialize(
        _fan_out(_pq_subvectors(corpus, id_col, vec_col, m_sub, sub_dim), "nid")
        .withColumn(
            "qs",
            F.transform(F.col("s"), lambda x: F.floor(x * quant + F.lit(0.5)).cast("long")),
        )
    )
    cents = (
        # k_max-capped seeding (see CENTROID_K_MAX): at most k_max
        # codewords per subspace, never n/stride.
        subs.where(
            (F.col("nid") % stride == 0) & (F.col("nid") < stride * k_max)
        )
        .select("m", F.col("nid").alias("cent_id"), F.col("s").alias("cvec"))
    )
    comp = F.col("ssum").cast("double") / (F.lit(float(quant)) * F.col("n").cast("double"))
    for it in range(iters):
        scored = subs.join(F.broadcast(cents), "m").select(
            "nid", "m", "qs",
            F.col("cent_id"),
            _pq_qd2(F.col("s"), F.col("cvec"), quant).alias("qd2"),
        )
        best = F.min_by(F.col("cent_id"), F.struct(F.col("qd2"), F.col("cent_id")))
        assign = scored.groupBy("nid", "m").agg(
            best.alias("cent_id"), F.first("qs").alias("qs")
        )
        cents = (
            assign.select("m", "cent_id", F.posexplode("qs").alias("pos", "q"))
            .groupBy("m", "cent_id", "pos")
            .agg(F.sum("q").alias("ssum"), F.count(F.lit(1)).alias("n"))
            .select("m", "cent_id", "pos", comp.alias("comp"))
            .groupBy("m", "cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                    lambda s: s["comp"],
                ).alias("cvec")
            )
        )
        if it == iters - 1:
            cents = reliable_materialize(cents)
    return cents, subs


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m_sub: int = 4,
    sub_dim: int = 16,
    stride: int = 63,
    iters: int = 1,
    quant: int = 1_000_000,
    codebooks: DataFrame | None = None,
    k_max: int = CENTROID_K_MAX,
) -> DataFrame:
    """PQ search with Asymmetric Distance Computation (ADC): encode
    the corpus as per-subspace codes, precompute each query's distance
    to every codeword, then score a candidate as the SUM OF TABLE
    LOOKUPS — no full-dimension arithmetic per (query, vector) pair.

    Plan at scale: the distance table is (queries × m_sub × k_codes)
    — broadcast-sized for any bounded query batch — so the scoring
    join touches each corpus CODE row (m_sub small ints per vector,
    not the vector) once per query, map-side; the only shuffle is the
    (query, neighbor)-keyed sum of m_sub quantized lookups (integer,
    associative). Per-query top-k is a window over scored candidates.
    Approximation error vs exact search is the per-subspace
    quantization residual — measure it by diffing against
    `ann_brute_topk` on the same queries, the same harness as the IVF
    recall query.

    Output: (query_id, neighbor_id, adc_dist, rk) — ascending
    approximate distance, ties to the lower neighbor id, self
    excluded.
    """
    from pyspark.sql import Window

    if codebooks is not None:
        cents = codebooks
        corpus_subs = _fan_out(
            _pq_subvectors(corpus, id_col, vec_col, m_sub, sub_dim), "nid"
        )
    else:
        # training already exploded + materialized the corpus
        # subvectors — the encode pass reuses that frame, so the
        # corpus × m_sub fan-out (the query's dominant scan) is paid
        # once, not twice
        cents, corpus_subs = _pq_train(
            corpus, id_col, vec_col, m_sub, sub_dim, stride, iters, quant, k_max
        )
    scored = corpus_subs.join(F.broadcast(cents), "m").select(
        "nid", "m", "cent_id", _pq_qd2(F.col("s"), F.col("cvec"), quant).alias("qd2")
    )
    codes = scored.groupBy("nid", "m").agg(
        F.min_by(F.col("cent_id"), F.struct(F.col("qd2"), F.col("cent_id"))).alias("code")
    )
    qsubs = _pq_subvectors(queries, id_col, vec_col, m_sub, sub_dim).select(
        F.col("nid").alias("query_id"), "m", F.col("s").alias("qs")
    )
    dtab = qsubs.join(F.broadcast(cents), "m").select(
        "query_id", "m", F.col("cent_id").alias("code"),
        _pq_qd2(F.col("qs"), F.col("cvec"), quant).alias("qd2"),
    )
    adc = (
        codes.join(F.broadcast(dtab), ["m", "code"])
        .where(F.col("nid") != F.col("query_id"))
        .groupBy("query_id", F.col("nid").alias("neighbor_id"))
        .agg(F.sum("qd2").alias("qadc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("qadc"), F.col("neighbor_id"))
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("qadc") / F.lit(float(quant)), 6).alias("adc_dist"),
            "rk",
        )
    )
