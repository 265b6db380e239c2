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
