"""Unit tests for operators not covered by the SQL-oracle harness."""

import pytest
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.operators.dedup import dedup_deterministic
from real_time_data_pipeline_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_stub,
    documents_as_media,
    extract_features,
)
from real_time_data_pipeline_spark.operators.normalize import (
    guarded_ratio,
    int_with_default,
    normalize_bool,
)
from real_time_data_pipeline_spark.operators.text import word_shingles
from real_time_data_pipeline_spark.sources.tables import load_table


def test_normalize_bool_reference_semantics(spark):
    # Mirrors the reference producer's as_bool unit test
    # (tests/test_producer_schema.py in the reference): 1→true,
    # 0→false, bool passthrough, out-of-domain→NULL.
    df = spark.createDataFrame(
        [(1,), (0,), (2,), (None,)], "v int"
    ).select(normalize_bool("v").alias("b"))
    assert [r.b for r in df.collect()] == [True, False, None, None]


def test_int_with_default(spark):
    df = spark.createDataFrame([("3",), (None,), ("x",)], "v string").select(
        int_with_default("v").alias("i")
    )
    assert [r.i for r in df.collect()] == [3, 0, 0]


def test_guarded_ratio_zero_denominator(spark):
    df = spark.createDataFrame(
        [(3.0, 1, 2), (0.0, 0, 0), (1.0, None, 1)], "n double, a int, b int"
    ).select(guarded_ratio("n", "a", "b").alias("r"))
    rows = [r.r for r in df.collect()]
    assert rows[0] == pytest.approx(1.0)
    assert rows[1] is None  # divide-by-zero guard
    assert rows[2] is None  # NULL propagates through the guard


def test_dedup_deterministic_picks_latest(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k int, ts int, v string"
    )
    out = dedup_deterministic(df, ["k"], [F.desc("ts")])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "b", 2: "c"}


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",), ("",)], "t string").select(
        word_shingles("t", 3).alias("s")
    )
    rows = [r.s for r in df.collect()]
    assert rows[0] == []  # fewer words than n
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == []


def test_decode_stub_production_mode_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", deterministic_fake=False)


def test_multimodal_pipeline_plumbing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = documents_as_media(docs)
    feats = extract_features(media, deterministic_fake=True)
    rows = feats.collect()
    assert len(rows) == 20
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.feature)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_salted_join_matches_plain_join(spark):
    from real_time_data_pipeline_spark.operators.joins import salted_join

    # skewed left: one hot key
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1), (3, 2)], "k int, payload int"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "a"), (4, "d")], "rk int, label string")
    plain = left.join(right, left["k"] == right["rk"]).select("k", "payload", "label")
    salted = salted_join(left, right, "k", "rk", salt=4).select("k", "payload", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # outer flavor: unmatched left rows survive with NULL labels
    salted_left = salted_join(left, right, "k", "rk", salt=4, how="left")
    assert salted_left.where(F.col("label").isNull()).count() == 1  # k=3


# ---------------------------------------------------------------------------
# Sampling / splits
# ---------------------------------------------------------------------------


def test_hash_split_stable_under_union_and_repartition(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    base = {r.doc_id: r.split for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    # Adding rows and changing partitioning must not move any existing row.
    noisy = docs.union(docs.limit(50).withColumn("doc_id", F.col("doc_id") + 10_000_000)).repartition(7)
    again = {r.doc_id: r.split for r in hash_split(noisy, "doc_id").select("doc_id", "split").collect()}
    assert all(again[k] == v for k, v in base.items())


def test_hash_split_proportions(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    counts = dict(
        hash_split(docs, "doc_id").groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    total = sum(counts.values())
    assert 0.7 < counts.get("train", 0) / total < 0.9
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_deterministic_sample_is_subset_and_stable(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.sampling import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    s1 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    s2 = {r.doc_id for r in deterministic_sample(docs.repartition(13), "doc_id", 0.2).select("doc_id").collect()}
    assert s1 == s2
    n = docs.count()
    assert 0.05 * n < len(s1) < 0.4 * n


# ---------------------------------------------------------------------------
# Chunking reconstructs the document
# ---------------------------------------------------------------------------


def test_chunk_documents_cover_and_reconstruct(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0).limit(20)
    size, stride = 200, 150
    chunks = chunk_documents(docs, "doc_id", "text", size=size, stride=stride)
    texts = {r.doc_id: r.text for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in chunks.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(texts)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        full = texts[doc_id]
        # chunk content is exactly the substring; stitched prefixes rebuild the doc
        rebuilt = ""
        for r in rows:
            start = r.chunk_idx * stride
            assert full[start : start + size] == r.chunk_text
            rebuilt = rebuilt[:start] + r.chunk_text
        assert rebuilt == full


# ---------------------------------------------------------------------------
# IVF vs brute-force recall
# ---------------------------------------------------------------------------


def test_ivf_recall_against_brute_force(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.similarity import ann_brute_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = ann_brute_topk(q, emb, "vec_id", "embedding", k=5)
    ex = {(r.query_id, r.neighbor_id) for r in exact.collect()}

    def recall(nprobe: int) -> tuple[float, set]:
        ap = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                q, emb, "vec_id", "embedding", k=5, centroid_stride=29, nprobe=nprobe
            ).collect()
        }
        return len(ap & ex) / len(ex), ap

    r3, ap3 = recall(3)
    r9, _ = recall(9)
    # more probes → monotonically better recall, with a sane floor at
    # half the lists probed; exactness is NOT expected (it's ANN).
    assert r9 >= r3 >= 0.2
    assert r9 >= 0.5
    # every query answered with a full k even at narrow probes
    from collections import Counter

    per_q = Counter(qid for qid, _ in ap3)
    assert all(c == 5 for c in per_q.values())


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------


def test_connected_components_chain_and_islands(spark):
    from real_time_data_pipeline_spark.operators.similarity import connected_components

    # chain 1-2-3-4 (one component), pair 10-11, and 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r.id_a: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


# ---------------------------------------------------------------------------
# Multimodal: resize + frame sampling
# ---------------------------------------------------------------------------


def test_resize_stub_modes():
    from real_time_data_pipeline_spark.operators.multimodal import resize_stub

    with pytest.raises(NotImplementedError):
        resize_stub(b"abc", 4, 4)
    out = resize_stub(b"abc", 4, 4, deterministic_fake=True)
    assert out == b"abcabcabcabcabca"[:16] and len(out) == 16


def test_resize_images_plumbing(spark, sf_dir):
    from real_time_data_pipeline_spark.operators.multimodal import (
        documents_as_media,
        resize_images,
    )

    media = documents_as_media(load_table(spark, sf_dir, "documents")).limit(10)
    out = resize_images(media, 8, 8).collect()
    assert all(r.n_bytes == 64 and len(r.payload) == 64 for r in out)


def test_frame_sample_plan(spark):
    from real_time_data_pipeline_spark.operators.multimodal import frame_sample_plan

    vids = spark.createDataFrame(
        [(1, 2.5, 30.0), (2, 0.4, 24.0)], "vid long, duration_s double, fps double"
    )
    rows = frame_sample_plan(vids, every_s=1.0).collect()
    by_vid: dict[int, list] = {}
    for r in rows:
        by_vid.setdefault(r.vid, []).append((r.sample_t_s, r.frame_idx))
    assert by_vid[1] == [(0.0, 0), (1.0, 30), (2.0, 60)]
    assert by_vid[2] == [(0.0, 0)]


def test_redact_only_touches_matches(spark):
    from real_time_data_pipeline_spark.operators.text import redact

    df = spark.createDataFrame(
        [("mail a.b@c.io now", "mail [REDACTED] now"),
         ("id 1234567 ok", "id [REDACTED] ok"),
         ("clean text 123", "clean text 123")],
        "t string, want string",
    ).select(redact("t").alias("got"), "want")
    assert all(r.got == r.want for r in df.collect())


# ---------------------------------------------------------------------------
# Hot-shingle document-frequency cap
# ---------------------------------------------------------------------------


def test_jaccard_max_df_prunes_hot_shingles(spark):
    from real_time_data_pipeline_spark.operators.similarity import jaccard_pairs

    # Every doc shares the hot run "the of and"; docs 1/2 also share
    # the rare 3-gram "alpha beta gamma" (and are otherwise identical).
    hot = "the of and"
    rows = [(1, f"{hot} alpha beta gamma"), (2, f"{hot} alpha beta gamma")] + [
        (i, f"{hot} unique{i} token{i} word{i}") for i in range(3, 30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # Uncapped: the hot shingles connect everything; docs 1/2 are exact
    # dups so they pair at jaccard 1.0 regardless.
    uncapped = {(r.id_a, r.id_b): r.jaccard for r in
                jaccard_pairs(df, "doc_id", "text", max_df=None, threshold=0.1).collect()}
    assert uncapped[(1, 2)] == 1.0
    assert len(uncapped) > 1  # hot shingles created spurious pairs

    # Capped at df<=5: every shingle containing the hot run (df=29)
    # drops; only the rare shared 3-grams survive, so exactly the true
    # near-dup pair remains — and its Jaccard is over the capped sets.
    capped = {(r.id_a, r.id_b): r.jaccard for r in
              jaccard_pairs(df, "doc_id", "text", max_df=5, threshold=0.1).collect()}
    assert capped == {(1, 2): 1.0}


# ---------------------------------------------------------------------------
# _bucketed_pair_counts: the shared inverted-index core
# ---------------------------------------------------------------------------
# The r12 flip landed: jaccard/containment/directional/winnowing all call
# the helper now. The *_via_helper replicas below are kept as independent
# reconstructions of each consumer's composition — the equivalence tests
# pin the production operators against them (and the brute-force oracle),
# so a future edit to either side that changes rows or plan shape fails.


def _pair_family_corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "alpha beta gamma delta"),          # subset of 1 and 2
        (4, "one two three four five six seven"),
        (5, "one two three four five six eight"),
        (6, "totally different words entirely here now"),
        (7, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bucketed_pair_counts_matches_brute_force(spark):
    from real_time_data_pipeline_spark.operators.similarity import (
        _bucketed_pair_counts,
        shingle_postings,
    )

    from tests.oracle import py_word_shingles

    df = _pair_family_corpus(spark)
    texts = {r.doc_id: r.text for r in df.collect()}
    n = 3
    sets = {i: py_word_shingles(t, n) for i, t in texts.items()}
    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, "doc_id", "text", n), "doc_id", "shingle", None
    )
    want_inter = {
        (a, b): len(sets[a] & sets[b])
        for a in sets for b in sets
        if a < b and sets[a] & sets[b]
    }
    assert {(r.id_a, r.id_b): r.inter for r in inter.collect()} == want_inter
    assert {r.doc_id: r.n_sh for r in counts.collect()} == {
        i: len(s) for i, s in sets.items()
    }


def test_bucketed_pair_counts_max_df_caps_before_counts(spark):
    """Denominators must be post-cap: a shingle dropped by max_df must
    vanish from per-doc counts too, or ratios stop being true Jaccard
    of the capped sets."""
    from real_time_data_pipeline_spark.operators.similarity import (
        _bucketed_pair_counts,
        shingle_postings,
    )

    hot = "the of and"
    rows = [(i, f"{hot} unique{i} token{i} word{i}") for i in range(1, 8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, "doc_id", "text", 3), "doc_id", "shingle", 3
    )
    # every cross-doc shingle contains the hot run (df=7 > 3) → no pairs,
    # and EACH of the 7 docs keeps exactly its 3 unique-suffix shingles
    # (a full dict, so a doc silently dropped from counts fails too).
    assert inter.count() == 0
    assert {r.doc_id: r.n_sh for r in counts.collect()} == {i: 3 for i in range(1, 8)}


def _jaccard_via_helper(df, id_col, text_col, n=3, threshold=0.5, max_df=10_000):
    """Exactly the r12 flip shape for `jaccard_pairs`."""
    from real_time_data_pipeline_spark.operators.similarity import (
        _bucketed_pair_counts,
        shingle_postings,
    )

    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n), id_col, "shingle", max_df
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


def _containment_via_helper(df, id_col, text_col, n=3, threshold=0.8, max_df=10_000):
    from real_time_data_pipeline_spark.operators.similarity import (
        _bucketed_pair_counts,
        shingle_postings,
    )

    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n), id_col, "shingle", max_df
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    cont = F.col("inter") / F.least("n_a", "n_b")
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .where(cont >= threshold)
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )


def _directional_via_helper(df, id_col, text_col, n=3, threshold=0.9, max_df=10_000):
    from real_time_data_pipeline_spark.operators.similarity import (
        _bucketed_pair_counts,
        shingle_postings,
    )

    inter, counts = _bucketed_pair_counts(
        shingle_postings(df, id_col, text_col, n), id_col, "shingle", max_df
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    scored = inter.join(ca, "id_a").join(cb, "id_b")
    a_in_b = scored.where(F.col("inter") / F.col("n_a") >= threshold).select(
        F.col("id_a").alias("src_id"),
        F.col("id_b").alias("dst_id"),
        F.round(F.col("inter") / F.col("n_a"), 6).alias("containment"),
    )
    b_in_a = scored.where(F.col("inter") / F.col("n_b") >= threshold).select(
        F.col("id_b").alias("src_id"),
        F.col("id_a").alias("dst_id"),
        F.round(F.col("inter") / F.col("n_b"), 6).alias("containment"),
    )
    return a_in_b.unionAll(b_in_a)


def _winnowing_via_helper(df, id_col, text_col, k=4, w=4, min_shared=2, max_df=10_000):
    from real_time_data_pipeline_spark.operators.similarity import (
        _bucketed_pair_counts,
        winnowing_postings,
    )

    inter, _ = _bucketed_pair_counts(
        winnowing_postings(df, id_col, text_col, k, w),
        id_col,
        "fp",
        max_df,
        distinct_ids=True,
        with_counts=False,
    )
    return inter.withColumnRenamed("inter", "n_shared").where(
        F.col("n_shared") >= min_shared
    )


def test_bucketed_pair_counts_equivalent_to_inlined_consumers(spark):
    """Row-identical to all four inlined copies on a corpus exercising
    subsets, exact dups, partial overlap and disjoint docs — at a
    threshold low enough that rounding is load-bearing."""
    from real_time_data_pipeline_spark.operators.similarity import (
        containment_pairs,
        directional_containment_pairs,
        jaccard_pairs,
        winnowing_pairs,
    )

    df = _pair_family_corpus(spark)
    for inlined, helper, kw in [
        (jaccard_pairs, _jaccard_via_helper, {"threshold": 0.05}),
        (containment_pairs, _containment_via_helper, {"threshold": 0.3}),
        (directional_containment_pairs, _directional_via_helper, {"threshold": 0.5}),
        (winnowing_pairs, _winnowing_via_helper, {"min_shared": 1}),
    ]:
        want = sorted(map(tuple, inlined(df, "doc_id", "text", **kw).collect()))
        got = sorted(map(tuple, helper(df, "doc_id", "text", **kw).collect()))
        assert got == want, f"{inlined.__name__} diverges from helper form"
        assert want, f"{inlined.__name__} equivalence corpus produced no rows"


def test_bucketed_pair_counts_plan_shape_identical(spark):
    """The helper form must keep the inlined plans' exchange counts —
    the r12 flip is forbidden from adding a shuffle."""
    from real_time_data_pipeline_spark.operators.similarity import (
        jaccard_pairs,
        winnowing_pairs,
    )
    from real_time_data_pipeline_spark.plans import executed_plan

    df = _pair_family_corpus(spark)
    for inlined, helper, kw in [
        (jaccard_pairs, _jaccard_via_helper, {"threshold": 0.05}),
        (winnowing_pairs, _winnowing_via_helper, {"min_shared": 1}),
    ]:
        want = executed_plan(inlined(df, "doc_id", "text", **kw))
        got = executed_plan(helper(df, "doc_id", "text", **kw))
        for marker in ("Exchange hashpartitioning", "InMemoryTableScan"):
            assert got.count(marker) == want.count(marker), (
                f"{inlined.__name__}: {marker} count diverges"
            )


def _union_find_components(edges):
    """Ground truth: Python union-find, label = component minimum."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_both_algorithms_match_union_find(spark):
    """Min-label (with pointer jumping) and star contraction both
    match a Python union-find on chains, cliques, islands, and seeded
    random graphs — including a 40-chain, which un-jumped min-label
    could not finish inside max_iter."""
    import random

    from real_time_data_pipeline_spark.operators.similarity import (
        connected_components,
        connected_components_star,
    )

    cases = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        [(i, i + 1) for i in range(1, 40)],  # long chain (worst case hop count)
        [(5, 5 + i) for i in range(1, 8)],   # star already
    ]
    rng = random.Random(7)
    for _ in range(3):
        n = 60
        cases.append([
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ])
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find_components(edges)
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got_min = {r.id_a: r.cluster_id for r in connected_components(df).collect()}
        got_star = {r.id_a: r.cluster_id for r in connected_components_star(df).collect()}
        assert got_min == want, f"min-label wrong for edges={edges}"
        assert got_star == want, f"star wrong for edges={edges}"


def test_semdedup_one_pass_shadowing(spark):
    """The documented one-pass rule: a vector is dropped when ANY
    lower-id cluster-mate is within threshold — even one that was
    itself dropped. Chain a~b, b~c, a!~c (ids a<b<c): greedy would
    keep c, the one-pass rule drops it."""
    from real_time_data_pipeline_spark.operators.similarity import semdedup_prune

    # 2-d unit vectors at angles 0, 25, 60 degrees: cos(a,b)=.906,
    # cos(b,c)=cos(35deg)=.819, cos(a,c)=cos(60deg)=.5.
    import math

    vecs = [
        (i + 1, [math.cos(math.radians(d)), math.sin(math.radians(d))])
        for i, d in enumerate((0.0, 25.0, 60.0))
    ]
    corpus = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    # One centroid -> everything in one cluster.
    cents = spark.createDataFrame([(0, [1.0, 0.0])], "cent_id long, cvec array<double>")
    kept = sorted(
        r.vec_id
        for r in semdedup_prune(corpus, "vec_id", "embedding", cents, 0.75).collect()
    )
    assert kept == [1]  # b shadowed by a; c shadowed by (dropped) b

    # Higher threshold: b still within .906 of a, but c (.819 from b,
    # .5 from a) clears it and survives.
    kept = sorted(
        r.vec_id
        for r in semdedup_prune(corpus, "vec_id", "embedding", cents, 0.85).collect()
    )
    assert kept == [1, 3]


def test_winnowing_matches_brute_force(spark):
    """Fingerprint SET per doc == a Python reimplementation of
    winnowing (hash every k-gram, min of every complete w-window),
    including the short-doc truncated-window rule."""
    import hashlib

    from real_time_data_pipeline_spark.operators.similarity import (
        winnowing_fingerprints,
    )

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "one two three four"),          # exactly k words -> 1 gram
        (3, "alpha beta gamma"),             # < k words -> no grams
        (4, "a b c d e f g a b c d e f g"),  # internal repetition
        (5, ""),
    ]
    k, w = 4, 4

    def brute(text):
        ws = text.split()
        grams = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        if not hs:
            return set()
        out = set()
        for i in range(max(len(hs) - w, 0) + 1):
            out.add(min(hs[i : i + w]))
        return out

    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, "doc_id", "text", k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for doc_id, text in texts:
        assert got.get(doc_id, set()) == brute(text), f"doc {doc_id}"


def test_winnowing_pairs_shared_run_guarantee(spark):
    """Two docs sharing a run of w+k-1 words MUST share >= 1
    fingerprint (the winnowing guarantee); unrelated docs share none."""
    from real_time_data_pipeline_spark.operators.similarity import winnowing_pairs

    shared = "zeta eta theta iota kappa lambda mu"  # w+k-1 = 7 words
    df = spark.createDataFrame(
        [
            (1, f"intro words here {shared} tail one"),
            (2, f"different opening {shared} other ending text"),
            (3, "completely unrelated content with nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in winnowing_pairs(
            df, "doc_id", "text", k=4, w=4, min_shared=1, max_df=None
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_mixture_weights_sum_to_one(spark, sf_dir):
    from real_time_data_pipeline_spark.queries.registry import REGISTRY

    rows = REGISTRY["corpus_mixture_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # epochs > 1 for below-average cells, < 1 for above-average ones
    # (temperature flattens the mixture).
    assert any(r.epochs > 1 for r in rows) and any(r.epochs < 1 for r in rows)


def test_lsh_oversize_routing_mixed_swarms_and_residual(spark):
    """Oversized-bucket routing at the operator level, with handcrafted
    signatures: two co-bucketed exact-dup swarms must each get their
    own chain (never cross-linked, never quadratic), and a unique-sig
    member of an oversized bucket must be COUNTED as residual."""
    from pyspark.sql import Row
    from real_time_data_pipeline_spark.operators.similarity import (
        MINHASH_NUM,
        lsh_candidate_pairs,
        lsh_oversize_stats,
    )

    sig_a = [1] * MINHASH_NUM                 # swarm A: ids 0..39
    sig_b = [1] * (MINHASH_NUM - 2) + [99, 99]  # swarm B: ids 100..114
    sig_u = [1, 1] + [5] * (MINHASH_NUM - 2)    # unique: id 999 (shares band 0)
    rows = (
        [Row(doc_id=i, sig=sig_a) for i in range(40)]
        + [Row(doc_id=100 + i, sig=sig_b) for i in range(15)]
        + [Row(doc_id=999, sig=sig_u)]
    )
    sigs = spark.createDataFrame(rows, "doc_id long, sig array<bigint>")

    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket=10).collect()
    }
    want = {(i, i + 1) for i in range(39)} | {
        (100 + i, 101 + i) for i in range(14)
    }
    assert pairs == want  # two chains, no cross-swarm or residual pairs

    st = lsh_oversize_stats(sigs, "doc_id", max_bucket=10).first()
    # With 48 bands of 2 hashes: A and B share every band but the
    # last, the unique doc joins only band 0. Oversized buckets:
    # bands 0-46 hold the merged A∪B bucket (band 0 also the unique
    # doc), band 47 holds A (40) and B (15) separately. Residual (r8
    # semantics) = every member of a MULTI-sig-group oversized bucket
    # (they all lose cross-group candidates — ADVICE r7): band 0 has
    # 56, bands 1-46 have 55 each; band 47's single-group buckets are
    # fully chained and contribute 0.
    assert st.n_residual_memberships == 56 + 46 * 55
    assert st.n_oversized_buckets == 47 + 2
    assert st.n_oversized_memberships == 56 + 46 * 55 + 40 + 15


def test_lsh_candidate_pairs_string_ids_all_policies(spark):
    """The pair expansion (and BOTH oversize policies' branches) must
    analyze for non-long id columns — the drop policy's empty array
    once hardcoded long ids (code-review r7 finding)."""
    from pyspark.sql import Row
    from real_time_data_pipeline_spark.operators.similarity import (
        MINHASH_NUM,
        lsh_candidate_pairs,
    )

    sig = [1] * MINHASH_NUM
    sigs = spark.createDataFrame(
        [Row(doc_id=f"d{i:02d}", sig=sig) for i in range(12)],
        "doc_id string, sig array<bigint>",
    )
    full = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert full == {(f"d{a:02d}", f"d{b:02d}") for a in range(12) for b in range(a + 1, 12)}
    chain = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket=5).collect()
    }
    assert chain == {(f"d{i:02d}", f"d{i+1:02d}") for i in range(11)}
    assert (
        lsh_candidate_pairs(sigs, "doc_id", max_bucket=5, oversize="drop").count()
        == 0
    )


def test_cache_scope_thread_isolation(spark):
    """Concurrent cache_scope blocks (two foreachBatch bodies, a
    second query thread) must each release exactly the frames THEIR
    thread created: one scope's exit can never unpersist another
    thread's still-live cache, and unscoped persist_tracked frames
    stay registered for release_caches (ADVICE r8 — the old length
    watermark popped across threads)."""
    import threading

    from real_time_data_pipeline_spark.operators import materialize
    from real_time_data_pipeline_spark.operators.materialize import (
        cache_scope,
        persist_tracked,
        release_caches,
    )

    release_caches(blocking=True)
    outer = persist_tracked(spark.range(10))  # caller-owned, unscoped
    outer.count()

    entered = threading.Barrier(2)
    release_b = threading.Event()
    slow_df = {}

    def slow():
        with cache_scope():
            slow_df["df"] = persist_tracked(spark.range(20))
            slow_df["df"].count()
            entered.wait()
            release_b.wait(timeout=30)
        slow_df["after"] = slow_df["df"].storageLevel.useMemory

    def fast():
        entered.wait()
        with cache_scope():
            df = persist_tracked(spark.range(30))
            df.count()
        # fast scope exited while slow scope still holds its frame:
        # slow's cache must still be persisted
        slow_df["seen_by_fast"] = slow_df["df"].storageLevel.useMemory
        release_b.set()

    t1, t2 = threading.Thread(target=slow), threading.Thread(target=fast)
    t1.start(); t2.start(); t1.join(timeout=60); t2.join(timeout=60)

    assert slow_df["seen_by_fast"], "fast scope exit unpersisted slow's cache"
    assert not slow_df["after"], "slow scope exit failed to release its own"
    # the unscoped caller frame survived both scopes
    assert outer.storageLevel.useMemory
    assert release_caches(blocking=True) == 1


def test_shared_artifact_memo_builds_once_and_keys_by_sf(spark, sf_dir):
    """The session-scoped artifact memo (queries/similarity.py) must
    invoke a builder exactly once per (session, sf_dir, name), return
    the SAME materialized frame to every consumer, and never register
    anything in the tracked-cache registry (release_caches must not
    be able to unpersist a shared index)."""
    from real_time_data_pipeline_spark.operators import materialize
    from real_time_data_pipeline_spark.queries.similarity import (
        _SHARED_ARTIFACTS,
        _shared_artifact,
    )

    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5)

    before = len(materialize._LIVE_CACHES)
    a = _shared_artifact(spark, sf_dir, "__memo_test", build)
    b = _shared_artifact(spark, sf_dir, "__memo_test", build)
    assert calls["n"] == 1 and a is b
    assert a.count() == 5
    # a different sf_dir is a different corpus -> fresh build
    c = _shared_artifact(spark, sf_dir + "/other", "__memo_test", build)
    assert calls["n"] == 2 and c is not a
    # nothing entered the tracked-cache registry
    assert len(materialize._LIVE_CACHES) == before
    for k in [k for k in _SHARED_ARTIFACTS if k[2] == "__memo_test"]:
        del _SHARED_ARTIFACTS[k]


def test_shared_artifact_memo_evicts_foreign_app_ids(spark, sf_dir):
    """ADVICE r8: entries keyed by OTHER applicationIds (stopped
    SparkContexts) are evicted on the next build-miss, and
    clear_shared_artifacts drops everything (the lost-executor
    escape hatch)."""
    from real_time_data_pipeline_spark.queries.artifacts import (
        _SHARED_ARTIFACTS,
        _shared_artifact,
        clear_shared_artifacts,
    )

    import os
    import tempfile

    # Simulate a dead app that HAD a reliable checkpoint dir: eviction
    # must also best-effort remove its per-context rdd-* directory
    # (ADVICE r9 — the ContextCleaner died with the app).
    dead_dir = tempfile.mkdtemp(prefix="dead-app-ckpt-")
    with open(os.path.join(dead_dir, "rdd-0"), "w") as f:
        f.write("orphaned checkpoint block")
    stale_key = ("app-that-stopped-long-ago", sf_dir, "__stale_test")
    _SHARED_ARTIFACTS[stale_key] = (spark.range(1), dead_dir)
    df = _shared_artifact(spark, sf_dir, "__evict_test", lambda: spark.range(3))
    assert df.count() == 3
    assert stale_key not in _SHARED_ARTIFACTS  # foreign appId evicted
    assert not os.path.exists(dead_dir)  # dead app's checkpoints deleted
    app = spark.sparkContext.applicationId
    assert (app, sf_dir, "__evict_test") in _SHARED_ARTIFACTS
    n_before = len(_SHARED_ARTIFACTS)
    assert n_before >= 1
    clear_shared_artifacts()
    assert len(_SHARED_ARTIFACTS) == 0


def test_stride_seeding_is_k_max_capped(spark):
    """CENTROID_K_MAX (r13): the stride-seeded index families must
    produce a FIXED-size codebook at any corpus scale — the unbounded
    form grew seeds ~n/stride, which the r13 scaling curve measured as
    a superlinear assignment join (embed_pq_adc_topk x3->x10 exponent
    1.31 against a documented linear bound). Below the cap the seed
    set is IDENTICAL to the uncapped form, so every sf0.001-0.1
    oracle value is unchanged by construction."""
    from real_time_data_pipeline_spark.operators.similarity import (
        CENTROID_K_MAX,
        pq_codebooks,
        stride_centroids,
    )

    big = spark.range(0, 10_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i)) for i in range(4)]).alias("embedding"),
    )
    # corpus far above stride*k_max: seed count pins at k_max
    capped = stride_centroids(big, "vec_id", "embedding", stride=5, k_max=7)
    assert capped.count() == 7
    assert capped.agg(F.max("cent_id")).collect()[0][0] == 30  # 5 * (7-1)
    # corpus below the cap: identical to the uncapped stride rule
    small = big.where(F.col("vec_id") < 40)
    ids = sorted(
        r.cent_id
        for r in stride_centroids(small, "vec_id", "embedding", stride=5).collect()
    )
    assert ids == [0, 5, 10, 15, 20, 25, 30, 35]
    # PQ: per-subspace codeword count pins at k_max too
    cb = pq_codebooks(
        big, "vec_id", "embedding", m_sub=2, sub_dim=2, stride=5, k_max=3
    )
    per_m = {
        r.m: r.n
        for r in cb.groupBy("m").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_m and all(n <= 3 for n in per_m.values()), per_m
    assert CENTROID_K_MAX == 256


def test_artifact_build_breakdown_sums_to_total(spark, sf_dir):
    """`shared_artifact_build_breakdown` (r13, VERDICT r12 #2) must
    attribute every build second to a named artifact: per-name cells
    appear on first build, accumulate nothing on memo hits, and the
    map sums to `shared_artifact_build_seconds` up to rounding."""
    from real_time_data_pipeline_spark.queries.artifacts import (
        _SHARED_ARTIFACTS,
        _shared_artifact,
        shared_artifact_build_breakdown,
        shared_artifact_build_seconds,
    )

    before_total = shared_artifact_build_seconds()
    before_map = shared_artifact_build_breakdown()
    _shared_artifact(spark, sf_dir, "__bd_test", lambda: spark.range(3))
    _shared_artifact(spark, sf_dir, "__bd_test", lambda: spark.range(3))
    after_map = shared_artifact_build_breakdown()
    assert "__bd_test" in after_map
    cell = after_map["__bd_test"] - before_map.get("__bd_test", 0.0)
    total_delta = shared_artifact_build_seconds() - before_total
    assert cell > 0
    # one build only (memo hit adds nothing), and the named cell is
    # the whole delta up to the map's 3-decimal rounding
    assert abs(total_delta - cell) < 0.002
    # the full map reconciles with the aggregate counter whenever the
    # process has not crossed a session restart (same-session builds)
    assert abs(sum(after_map.values()) - shared_artifact_build_seconds()) < 0.01 * max(
        1, len(after_map)
    )
    for k in [k for k in _SHARED_ARTIFACTS if k[2] == "__bd_test"]:
        del _SHARED_ARTIFACTS[k]


def test_ingest_state_root_keys_on_full_sf_dir(spark, tmp_path):
    """Two corpora with the SAME basename must get distinct maintained-
    index state dirs (r15 review: basename-only keying let /a/sf1 and
    /b/sf1 clear and then serve each other's state), and the same
    corpus must map to the same deterministic dir name under the
    session checkpoint dir."""
    from real_time_data_pipeline_spark.queries.artifacts import (
        ingest_state_root,
    )

    sc = spark.sparkContext
    had = sc.getCheckpointDir()
    if had is None:
        sc.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        a1 = ingest_state_root(spark, "/corpora/a/sf1", "__isr_test")
        a2 = ingest_state_root(spark, "/corpora/a/sf1", "__isr_test")
        b = ingest_state_root(spark, "/corpora/b/sf1", "__isr_test")
        assert a1 == a2, "same corpus must be deterministic"
        assert a1 != b, "same-basename corpora must not share state"
        # trailing-slash normalization: one corpus, one dir
        assert ingest_state_root(spark, "/corpora/a/sf1/", "__isr_test") == a1
    finally:
        if had is None:
            # restore: PySpark has no unset; point back at a tmp dir
            sc.setCheckpointDir(str(tmp_path / "ckpt"))


def test_stopword_alternation_equals_per_word_sum(spark):
    # The one-pass alternation (r15 optimization) must count exactly
    # what the old per-word `\b{w}\b` sum counted — including shared
    # prefixes (a/and, le/les), punctuation-adjacent words, repeated
    # and abutting hits, and mixed case.
    from real_time_data_pipeline_spark.operators.text import (
        LANG_STOPWORDS,
        stopword_hits,
    )

    texts = [
        "the a is and of the-and a.of and,the",
        "le les une et dans les. le,les",
        "thethe andand ofof",          # no boundaries -> zero hits
        "The AND Of a IS",             # case folding
        "el los una y que y-y el",
        "der und das ein nicht und",
        "",
        "a a a a a and an the of is",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for lang, stops in LANG_STOPWORDS.items():
        legacy = sum(
            (F.regexp_count(F.lower("text"), F.lit(rf"\b{wd}\b")) for wd in stops),
            F.lit(0),
        ).cast("long")
        rows = df.select(
            legacy.alias("old"), stopword_hits("text", stops).alias("new")
        ).collect()
        assert [r.old for r in rows] == [r.new for r in rows], lang


def test_grouped_percentile_cont_matches_exact_percentile(spark):
    # Interpolation-parity property test (r16, VERDICT r15 #1): the
    # grouped rank-pick must reproduce F.percentile / DuckDB
    # quantile_cont on adversarial group shapes — singleton groups,
    # even/odd sizes, heavy duplicates (boundary ranks inside a tie
    # run), negatives, and fractions at every interpolation position.
    #
    # Interpolation-formula note: the helper computes the lerp form
    # x_lo + frac·(x_hi − x_lo) — DuckDB quantile_cont's formula, the
    # one the oracles check — while F.percentile computes the weighted
    # form (1−frac)·x_lo + frac·x_hi. The two differ only in the last
    # ulp. So: DYADIC fractions (0, 1/4, 1/2, 3/4, 1) over dyadic
    # values are exact in both forms and compared BIT FOR BIT;
    # non-dyadic fractions are compared at the queries' round-6
    # precision.
    from real_time_data_pipeline_spark.operators.ranking import (
        grouped_percentile_cont,
        release_rank_caches,
    )

    groups = {
        "one": [4.25],
        "two": [1.0, 2.0],
        "odd": [3.0, -1.5, 7.25, 0.5, 3.0],
        "even": [10.0, 0.25, -4.0, 2.5, 2.5, 8.0],
        "dups": [5.0, 5.0, 5.0, 5.0, 1.0, 9.0, 5.0],
        "wide": [float(i) * 0.25 for i in range(16)],
    }
    rows = [
        (g, v, i) for g, vs in groups.items() for i, v in enumerate(vs)
    ]
    # NULL handling: ignored within a group; an all-NULL group yields
    # no output row (F.percentile would yield NULL — callers left-join)
    rows += [("odd", None, 99), ("allnull", None, 0), ("allnull", None, 1)]
    df = spark.createDataFrame(rows, "g string, v double, k int")
    pcts = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0]
    out_cols = [f"p{i}" for i in range(len(pcts))]
    got = {
        r["g"]: [r[c] for c in out_cols]
        for r in grouped_percentile_cont(
            df, ["g"], "v", pcts, out_cols, tie_break=[F.asc("k")]
        ).collect()
    }
    release_rank_caches()
    exp = {
        r["g"]: [r[c] for c in out_cols]
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", p).alias(c) for p, c in zip(pcts, out_cols)])
        .collect()
    }
    assert "allnull" not in got
    assert set(got) == set(exp) - {"allnull"}
    dyadic = {0.0, 0.25, 0.5, 0.75, 1.0}
    for g in got:
        for p, mine, ref in zip(pcts, got[g], exp[g]):
            if p in dyadic:
                assert mine == ref, f"group {g} p={p}: {mine} != {ref}"
            else:
                assert round(mine, 6) == round(ref, 6), (
                    f"group {g} p={p}: {mine} !~ {ref}"
                )


def test_moving_frame_median_formula_matches_percentile_window(spark):
    # The r16 window_moving_median rewrite: sort_array(collect_list)
    # over the bounded frame + closed-form type-7 interpolation must
    # equal percentile(value, 0.5) OVER the same frame for every
    # frame size 1..7 (ramp-up rows exercise each n).
    from pyspark.sql import Window

    rows = [
        ("a", i, float(v))
        for i, v in enumerate([5.0, 1.25, 3.0, 3.0, -2.5, 8.75, 0.5, 4.0, 4.0])
    ] + [("b", 0, 2.25), ("b", 1, -1.0)]
    df = spark.createDataFrame(rows, "g string, seq int, value double")
    w = Window.partitionBy("g").orderBy("seq").rowsBetween(-6, Window.currentRow)
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    pos = F.lit(0.5) * (n - F.lit(1)).cast("double")
    lo = F.get(arr, F.floor(pos).cast("int"))
    hi = F.get(arr, F.ceil(pos).cast("int"))
    new = F.when(n > 0, lo + (pos - F.floor(pos)) * (hi - lo))
    old = F.percentile("value", 0.5).over(w)
    rows = df.select(new.alias("new"), old.alias("old")).collect()
    # exact binary fractions: both formulas are exact, compare strictly
    for r in rows:
        assert r.new == r.old


def test_temporal_overlap_flag_aggregate_ignores_null_users(spark):
    # Pins the NULL guard on data_temporal_split's overlap aggregate
    # (VERDICT r15 #4): the r15 flag-aggregate rewrite of
    # |distinct(train) ∩ distinct(test)| must keep INNER-JOIN
    # semantics, where NULL ≠ NULL — a NULL user_id on both sides is
    # NOT a shared user. Same expression shape as
    # queries/events_analytics.py::q_temporal_split.
    rows = [
        (1, "train"), (1, "test"),      # shared
        (2, "train"),                    # train-only
        (3, "test"),                     # test-only
        (None, "train"), (None, "test"), # NULLs on both sides
        (4, "train"), (4, "purged"),     # purged does not count
    ]
    df = spark.createDataFrame(rows, "user_id int, split string")
    got = (
        df.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max((F.col("split") == "train").cast("int")).alias("t"),
            F.max((F.col("split") == "test").cast("int")).alias("e"),
        )
        .agg(
            F.count(F.when((F.col("t") == 1) & (F.col("e") == 1), 1)).alias(
                "n_shared_users"
            )
        )
        .collect()[0]["n_shared_users"]
    )
    joined = (
        df.where("split = 'train'").select("user_id").distinct()
        .join(df.where("split = 'test'").select("user_id").distinct(), "user_id")
        .count()
    )
    assert got == joined == 1