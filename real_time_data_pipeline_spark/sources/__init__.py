"""Source builders: batch parquet tables, streaming file/rate/kafka."""

from real_time_data_pipeline_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
