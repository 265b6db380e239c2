"""Plan inspection + audit helpers."""

from real_time_data_pipeline_spark.plans.audit import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_cartesian_product,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "has_cartesian_product",
]
