"""real_time_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the capability surface of the
reference pipeline (``simsektalha/real-time-data-pipeline``): streaming
ingestion, schema-checked JSON decoding, type normalization, stateful
deduplication, derived-column computation, watermarked tumbling-window
aggregation, multi-sink fan-out, batch/stream parity, and data-quality
assertions — generalized into a library of composable DataFrame
operators plus a query registry, and extended with the operators a
large-scale LLM-training-data pipeline needs (dedup families,
similarity search, text analysis, multimodal column plumbing).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then always Arrow-batched).
"""

from real_time_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
