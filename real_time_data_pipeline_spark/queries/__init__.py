"""Query registry: every engine capability exposed as a named query.

Each entry pairs a Spark DataFrame program with (where expressible) an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. The
driver's correctness gate compares the two order-insensitively; the
local pytest harness (tests/test_oracle_parity.py) does the same at
sf0.001 so regressions surface before the round gate.
"""

from real_time_data_pipeline_spark.queries.registry import (
    REGISTRY,
    QuerySpec,
    oracle_sql,
    queries,
    query,
)

# Importing these modules populates REGISTRY via the @query decorator.
from real_time_data_pipeline_spark.queries import (  # noqa: E402,F401
    events_analytics,
    pipeline,
    relational,
    tpch_extra,
    text,
    similarity,
)

__all__ = ["REGISTRY", "QuerySpec", "query", "queries", "oracle_sql"]
