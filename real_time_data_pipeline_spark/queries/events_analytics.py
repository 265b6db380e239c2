"""Event-sequence analytics over the `events` stream table.

The batch twins of classic streaming analyses — ordered funnels,
inactivity-gap sessionization, transition matrices, and the full
window-frame vocabulary. Each runs identically on a stream (the
sessionization is `session_windowed_agg`'s gap logic; funnels become
`applyInPandasWithState` per-key sequence state), so these queries
double as the oracle-checkable parity surface for those streaming
operators.

Determinism: event timestamps are exact microseconds (see
`sources/tables.py::load_table`), every window ORDER BY carries the
unique `event_id`/`o_orderkey` tie-break, and float outputs round 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from real_time_data_pipeline_spark.queries.registry import query
from real_time_data_pipeline_spark.sources.tables import load_table


@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
    ), c AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
    ), p AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase: users advance a stage
    only with a LATER event than the previous stage's first hit.

    Plan at scale: three filtered aggregates on user_id — the filters
    push to the scan, each stage joins only the survivors of the
    previous one (monotonically shrinking), and all three share the
    user_id hash partitioning so AQE reuses the exchange. The
    single-row summary is a broadcast-combined count, no collect.
    """
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


@query(
    "event_sessionization_stats",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ), sessions AS (
      SELECT user_id, event_id,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_id, count(*) AS n_events
      FROM sessions GROUP BY 1, 2
    )
    SELECT user_id,
           count(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_session_events,
           round(avg(n_events), 6) AS avg_session_events
    FROM per_session GROUP BY user_id
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization (30 min) via lag + running sum of
    session-start flags — the batch twin of session windows, with
    per-user session-count/size stats.

    Plan at scale: ONE shuffle on user_id serves both window passes
    and the aggregates (same partitioning throughout). The running
    sum is a frame-bounded window — no self-join blowup. Streaming
    twin: `session_windowed_agg` (gap-merged state) gives the same
    sessions incrementally.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 1800 * 1_000_000
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.round(F.avg("n_events"), 6).alias("avg_session_events"),
    )


@query(
    "event_type_transitions",
    oracle="""
    SELECT from_type, to_type, count(*) AS n FROM (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ) WHERE to_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (lead over event time) —
    the Markov-chain input for behavior modeling. One shuffle on
    user_id for the window, then a tiny 25-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "window_frame_specs",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) / 100.0 AS running_spend,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 6) AS moving_avg_3,
           first_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS first_order,
           ntile(4) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS quartile,
           round(percent_rank() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), 6) AS pct_rank,
           round(cume_dist() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ), 6) AS cume
    FROM orders WHERE o_custkey < 500
    """,
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full window-frame vocabulary in one query: running frame,
    bounded moving frame, first_value, ntile, percent_rank, cume_dist.

    Plan at scale: a single shuffle on o_custkey feeds every function
    (identical partitioning + ordering → one Window node); the
    running sum accumulates exact cents. The o_custkey filter pushes
    to the scan.
    """
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    from real_time_data_pipeline_spark.queries.relational import cents

    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = w.rowsBetween(-2, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents("o_totalprice")).over(running) / 100.0).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(moving), 6).alias("moving_avg_3"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "json_map_extraction",
    oracle="""
    WITH built AS (
      SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events
    ), j AS (
      SELECT '{"a": ' || k || ', "b": ' || (k * 2) || ', "m": ' || (k % 5) || '}' AS doc
      FROM built
    ), kv AS (
      SELECT 'a' AS key, CAST(json_extract(doc, '$.a') AS BIGINT) AS val FROM j
      UNION ALL
      SELECT 'b', CAST(json_extract(doc, '$.b') AS BIGINT) FROM j
      UNION ALL
      SELECT 'm', CAST(json_extract(doc, '$.m') AS BIGINT) FROM j
    )
    SELECT key, count(*) AS n, CAST(sum(val) AS BIGINT) AS total,
           round(avg(val), 6) AS mean
    FROM kv GROUP BY key
    """,
)
def q_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type coverage (absent from the reference — SURVEY §1.3
    notes no maps anywhere): JSON → `map<string,int>` → explode →
    per-key aggregate.

    The map column stays JVM-side (`from_json` map decode + explode
    are codegen); the per-key aggregate sees 3 keys regardless of
    corpus size. Dynamic-schema JSON (unknown keys) is exactly where
    map beats struct: no schema evolution needed to aggregate new keys.
    """
    ev = load_table(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )  # one input file otherwise serializes the parse+explode stage
    k = F.get_json_object("props", "$.k").cast("int")
    doc = F.concat(
        F.lit('{"a": '), k.cast("string"),
        F.lit(', "b": '), (k * 2).cast("string"),
        F.lit(', "m": '), (k % 5).cast("string"),
        F.lit("}"),
    )
    kv = (
        ev.select(F.from_json(doc, "map<string,int>").alias("m"))
        .select(F.explode("m").alias("key", "val"))
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").cast("long").alias("total"),
        F.round(F.avg("val"), 6).alias("mean"),
    )


@query(
    "json_corrupt_tolerance",
    oracle="""
    WITH j AS (
      SELECT CASE WHEN event_id % 7 = 0
                  THEN '{"v": ' || (event_id % 100)
                  ELSE '{"v": ' || (event_id % 100) || '}' END AS doc
      FROM events
    ), parsed AS (
      SELECT CASE WHEN json_valid(doc)
                  THEN CAST(json_extract(doc, '$.v') AS INTEGER) END AS v
      FROM j
    )
    SELECT count(*) AS n_rows,
           count(v) AS n_parsed,
           count(*) - count(v) AS n_corrupt,
           CAST(sum(v) AS BIGINT) AS sum_v
    FROM parsed
    """,
)
def q_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record tolerance: a deterministic 1-in-7 slice of the
    JSON column is truncated mid-object; PERMISSIVE `from_json` yields
    NULL for those rows instead of failing the job — the semantics a
    100 TB ingest needs (quarantine + continue, never abort on one bad
    record). Counts and the valid-side aggregate are oracle-checked.
    """
    ev = load_table(spark, sf_dir, "events")
    doc = F.when(
        F.col("event_id") % 7 == 0,
        F.concat(F.lit('{"v": '), (F.col("event_id") % 100).cast("string")),
    ).otherwise(
        F.concat(F.lit('{"v": '), (F.col("event_id") % 100).cast("string"), F.lit("}"))
    )
    parsed = ev.select(F.from_json(doc, "v int").alias("r")).select(F.col("r.v").alias("v"))
    return parsed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_parsed"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_corrupt"),
        F.sum("v").cast("long").alias("sum_v"),
    )
