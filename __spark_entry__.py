"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Gold query at sf0.001;
``queries()``/``oracle_sql()`` expose the full registry from
``real_time_data_pipeline_spark.queries`` (one entry per implemented
operator from SURVEY.md §2, each with a DuckDB oracle where the
semantics are SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_data_pipeline_spark.queries import registry as _registry
from real_time_data_pipeline_spark import queries as _queries  # noqa: F401  (populates registry)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from real_time_data_pipeline_spark.queries.pipeline import q_gold_15m

    return q_gold_15m(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
