"""Declared schemas (SURVEY §1.2): explicit, never inferred.

The reference's 8-field station_status StructType
(`src/jobs/spark_streaming_job.py:34-43`) and its silver/gold
extensions — kept verbatim so a user of the reference can run the
same feed through this engine unchanged.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Bronze: decoded feed records (station_id NOT NULL, everything else nullable).
STATION_STATUS_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), False),
        StructField("num_bikes_available", IntegerType(), True),
        StructField("num_ebikes_available", IntegerType(), True),
        StructField("num_docks_available", IntegerType(), True),
        StructField("is_installed", BooleanType(), True),
        StructField("is_renting", BooleanType(), True),
        StructField("is_returning", BooleanType(), True),
        StructField("last_reported", LongType(), True),
    ]
)

# Raw (pre-normalization) shape: flags arrive as 0/1 ints or bools,
# counts as strings or ints — everything stringly-typed on the wire.
STATION_STATUS_RAW_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), True),
        StructField("num_bikes_available", StringType(), True),
        StructField("num_ebikes_available", StringType(), True),
        StructField("num_docks_available", StringType(), True),
        StructField("is_installed", StringType(), True),
        StructField("is_renting", StringType(), True),
        StructField("is_returning", StringType(), True),
        StructField("last_reported", StringType(), True),
    ]
)

SILVER_EXTRA_FIELDS = [
    StructField("event_ts", TimestampType(), True),
    StructField("pct_bikes_available", DoubleType(), True),
]

GOLD_SCHEMA = StructType(
    [
        StructField("station_id", StringType(), True),
        StructField("avg_pct_bikes_available", DoubleType(), True),
        StructField("avg_bikes", DoubleType(), True),
        StructField("avg_docks", DoubleType(), True),
        StructField("window_start", TimestampType(), True),
        StructField("window_end", TimestampType(), True),
    ]
)
