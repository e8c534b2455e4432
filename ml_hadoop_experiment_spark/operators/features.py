"""Feature engineering operators: hashing-trick term features.

Extension beyond the reference (BASELINE.json north-star). The hashing
trick (Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
Learning"; sklearn's HashingVectorizer) maps unbounded token vocabularies
onto a fixed feature space with NO vocabulary pass and NO driver state:
``bucket = hash(token) % num_features``. That makes it the standard text
featurizer at corpus scale — one map + one map-combined aggregation,
stateless, streaming-compatible.

Output is the long/COO layout ``(id, bucket, value)`` — exactly what the
sparse-tensor makers in ``schema/conversion.py`` consume, and what a
trainer-side ``SparseTensor``/CSR assembler wants. No dense vectors are
materialized anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.functions.hashing import (
    portable_token_hash_int,
    portable_token_hash_int_sql,
)


def hashed_term_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_features: int = 1024,
    signed: bool = True,
) -> DataFrame:
    """(id, bucket, value) hashed term-frequency features.

    ``signed=True`` applies the sign trick: a second hash bit decides
    whether a token contributes +1 or -1, making each bucket's expected
    collision contribution zero (the Weinberger et al. unbiasedness
    argument) — the variant sklearn enables by default. With
    ``signed=False`` values are plain term counts.

    Plan: tokenize + hash map-side, one map-combined ``groupBy(id,
    bucket)`` — a single shuffle whose width is bounded by
    ``num_features`` per document regardless of vocabulary size. The
    portable hash keeps the featurization bit-identical in DuckDB (and
    therefore stable across engine versions — a model trained on these
    features is not invalidated by a Spark upgrade, unlike
    ``xxhash64``-based buckets whose seed is engine-internal).

    Zero-sum buckets are KEPT when signed (a bucket whose +1/-1
    contributions cancel is still a defined feature value of 0 only if
    some token hashed there; buckets no token touched are absent) — this
    matches summing signed counts, and the SQL twin agrees by
    construction.
    """
    tokens = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    h = portable_token_hash_int(F.col("tok"))
    hashed = tokens.select(
        "id",
        (h % F.lit(num_features)).alias("bucket"),
        (
            F.when((F.shiftright(h, 16) % 2) == 0, F.lit(1)).otherwise(F.lit(-1))
            if signed
            else F.lit(1)
        ).alias("__sign"),
    )
    return hashed.groupBy("id", "bucket").agg(
        F.sum("__sign").alias("value")
    )


def hashed_term_features_sql(
    relation: str,
    id_expr: str,
    text_expr: str,
    num_features: int = 1024,
    signed: bool = True,
) -> str:
    """DuckDB twin of ``hashed_term_features`` (same hash, same sign bit)."""
    h = portable_token_hash_int_sql("tok")
    sign = (
        f"CASE WHEN ({h} // 65536) % 2 = 0 THEN 1 ELSE -1 END" if signed else "1"
    )
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id,
         unnest(regexp_split_to_array(trim(lower({text_expr})), '\\s+')) AS tok
  FROM {relation}
)
SELECT id, {h} % {num_features} AS bucket, CAST(sum({sign}) AS BIGINT) AS value
FROM toks
GROUP BY 1, 2
"""


__all__ = ["hashed_term_features", "hashed_term_features_sql"]
