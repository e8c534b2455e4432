from ml_hadoop_experiment_spark.functions.hashing import (
    PORTABLE_HASH_MOD,
    portable_string_unit_hash,
    portable_token_hash_hex,
    portable_unit_hash,
    spark_unit_hash,
)
from ml_hadoop_experiment_spark.functions.vectors import (
    cosine_similarity_expr,
    dot_expr,
    norm_expr,
)

__all__ = [
    "PORTABLE_HASH_MOD",
    "portable_unit_hash",
    "portable_string_unit_hash",
    "portable_token_hash_hex",
    "spark_unit_hash",
    "cosine_similarity_expr",
    "dot_expr",
    "norm_expr",
]
