"""Type-normalization scalar operators (reference P3–P8 rebuilt).

The reference normalizes messy feed records twice — once Python-side in
the producer (``src/ingestion/producer.py:33-51``: stringify ids, int
coercion with default, 0/1→bool, unknown→NULL) and once Spark-side in
the streaming job (``src/jobs/spark_streaming_job.py:75-92``: epoch→
timestamp, CASE-based bool normalization, guarded ratio). This module
expresses the union of both as pure column expressions so the whole
chain stays inside whole-stage codegen — no Python on the data path,
which is what makes it viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_to_ts(col: Column | str) -> Column:
    """Unix epoch seconds → timestamp.

    Reference: ``to_timestamp(from_unixtime(last_reported))``
    (`src/jobs/spark_streaming_job.py:77`). ``timestamp_seconds`` is the
    direct primitive — one expression, no string round-trip.
    """
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def normalize_bool(col: Column | str) -> Column:
    """0/1/boolean-ish → boolean, unknown values → NULL.

    Reference semantics (`src/ingestion/producer.py:35-40` +
    `src/jobs/spark_streaming_job.py:78-80`): 1→true, 0→false, real
    booleans pass through, anything else NULL.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.cast("string").isin("1", "true", "True"), F.lit(True))
        .when(c.cast("string").isin("0", "false", "False"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def int_with_default(col: Column | str, default: int = 0) -> Column:
    """Integer coercion with a default for NULL/uncastable values.

    Reference: producer ``int(x, default 0)`` (`src/ingestion/producer.py:44-50`).
    """
    c = F.col(col) if isinstance(col, str) else col
    # try_cast: uncastable → NULL → default (ANSI mode would throw)
    return F.coalesce(c.try_cast("int"), F.lit(default))


def guarded_ratio(num: Column | str, den_a: Column | str, den_b: Column | str) -> Column:
    """``num / (den_a + den_b)`` as double, NULL when the sum is not > 0.

    Reference P6 (`src/jobs/spark_streaming_job.py:86-92`): the
    divide-by-zero/NULL guard for ``pct_bikes_available``.
    """
    n = F.col(num) if isinstance(num, str) else num
    a = F.col(den_a) if isinstance(den_a, str) else den_a
    b = F.col(den_b) if isinstance(den_b, str) else den_b
    total = a + b
    return F.when(total > 0, n.cast("double") / total.cast("double")).otherwise(
        F.lit(None).cast("double")
    )


def decode_json_col(df: DataFrame, col: str, schema, drop: bool = True) -> DataFrame:
    """Parse a JSON string column against an explicit schema and flatten.

    Reference P2 (`src/jobs/spark_streaming_job.py:62`):
    ``from_json(value, schema)`` then ``select("r.*")``. Catalyst's
    ``OptimizeJsonExprs`` prunes unreferenced struct fields, so
    downstream projections only pay for the fields they read.
    """
    parsed = df.withColumn("__r", F.from_json(F.col(col), schema))
    out = parsed.select(
        *[c for c in df.columns if not (drop and c == col)],
        F.col("__r.*"),
    )
    return out
