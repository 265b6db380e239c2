"""Operational robustness surfaces a lakehouse engine needs beyond
query correctness: schema evolution on append, and in-flight metric
observation without a second scan."""

from pyspark.sql import functions as F


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Appending files with a NEW column must not break readers:
    mergeSchema unifies the footer schemas; old rows surface NULL for
    the added column — the additive-evolution contract a 100 TB table
    relies on (rewriting history is not an option)."""
    p = str(tmp_path / "tbl")
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(p)
    spark.range(3, 5).selectExpr(
        "id", "id * 2 AS a", "concat('v', id) AS b"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in merged.collect()}
    assert rows[0] == (0, None)  # pre-evolution rows: NULL for new col
    assert rows[4] == (8, "v4")
    # without mergeSchema Spark picks one footer; the engine's contract
    # is therefore: always set mergeSchema for evolving tables
    assert merged.where(F.col("b").isNull()).count() == 3


def test_observation_metrics_piggyback_on_one_pass(spark, sf_dir):
    """`df.observe` attaches aggregate metrics to a flowing query —
    row counts and quality tallies come back WITH the action instead
    of a second scan over 100 TB."""
    from pyspark.sql import Observation

    from real_time_data_pipeline_spark.sources.tables import load_table

    obs = Observation("quality")
    ev = load_table(spark, sf_dir, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("int")).alias("null_values"),
    )
    out = ev.where(F.col("event_type") == "view").count()  # the real action
    m = obs.get
    assert m["n_rows"] > out > 0  # observed BEFORE the filter
    assert m["null_values"] == 0
