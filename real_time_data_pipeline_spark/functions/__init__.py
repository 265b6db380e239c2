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
from real_time_data_pipeline_spark.operators.similarity import cosine, hyperplane_lsh_bucket
from real_time_data_pipeline_spark.operators.text import (
    hash32,
    hash60,
    lang_id,
    lang_scores,
    md5_hex,
    quality_features,
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
    "hyperplane_lsh_bucket",
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
