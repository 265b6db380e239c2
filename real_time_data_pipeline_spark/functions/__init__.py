"""User-facing scalar/aggregate function library.

One import surface for the engine's column-level vocabulary — every
function here is a pure `Column` expression (JVM-side, codegen-
friendly); nothing drops to Python.
"""

from real_time_data_pipeline_spark.operators.normalize import (
    epoch_to_ts,
    guarded_ratio,
    int_with_default,
    normalize_bool,
)
from real_time_data_pipeline_spark.operators.sampling import hash_bucket, sql_hash_bucket
from real_time_data_pipeline_spark.operators.similarity import (
    cosine,
    dequantize_embedding,
    dot,
    hyperplane_lsh_bucket,
    norm,
    quantize_embedding,
)
from real_time_data_pipeline_spark.operators.text import (
    hash32,
    hash60,
    lang_id,
    lang_scores,
    md5_hex,
    quality_features,
    redact,
    redaction_counts,
    token_count_bpe_ish,
    token_count_ws,
    word_shingles,
    words,
)
from real_time_data_pipeline_spark.queries.relational import cents, money

__all__ = [
    "epoch_to_ts",
    "guarded_ratio",
    "int_with_default",
    "normalize_bool",
    "cosine",
    "dot",
    "norm",
    "hyperplane_lsh_bucket",
    "quantize_embedding",
    "dequantize_embedding",
    "hash_bucket",
    "sql_hash_bucket",
    "redact",
    "redaction_counts",
    "md5_hex",
    "hash32",
    "hash60",
    "words",
    "word_shingles",
    "token_count_ws",
    "token_count_bpe_ish",
    "lang_id",
    "lang_scores",
    "quality_features",
    "cents",
    "money",
]
