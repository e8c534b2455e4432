"""Distributed time-series similarity search.

Extension beyond the reference, motivated by the retrieved distributed
series-search literature (REPOSE, ICDE 2021; Odyssey, VLDB 2023; EDBT
2019 streaming series similarity): find the k series most similar to a
query series across millions of keys — "which users/sensors behave like
this one".

Spark-first design (no index structure, no Python):
- each key's series is SPARSE (bucket, value) rows — never materialized
  into dense per-key arrays, so a key active for one hour costs one row;
- L1 distance with a missing-bucket-is-zero convention decomposes over a
  single LEFT join against the BROADCAST query series:

      dist(key) = Σ_a-buckets |a - q̃|  +  (Σ|q| - Σ_matched |q|)

  the first term aggregates map-side after the broadcast join; the
  second needs only the matched |q| sum and the query's total |q| (a
  one-row broadcast). ONE shuffle (the per-key agg), then a bounded
  top-k (TakeOrderedAndProject).
- all sums accumulate in DECIMAL (values quantized at the caller-chosen
  scale), so distances are exact, order-independent, and engine-identical
  — double accumulation would make the k-th neighbor partition-order-
  dependent. The final ranking tie-breaks on the key for a total order.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def series_l1_topk(
    df: DataFrame,
    key_cols: List[str],
    bucket_col: str,
    value_col: str,
    query_df: DataFrame,
    k: int = 10,
    decimals: str = "decimal(18,2)",
) -> DataFrame:
    """Top-``k`` keys whose sparse series is closest (L1) to the query.

    ``df``: (key_cols..., bucket, value) with one row per (key, bucket);
    ``query_df``: (bucket, value) — the query series, one row per bucket
    (broadcast; a series is KB-sized by construction).

    Output: ``key_cols..., distance (double), n_common`` — the k nearest
    by exact decimal L1 distance, ties broken by key.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    a = F.col(value_col).cast(decimals)
    q = query_df.select(
        F.col(bucket_col).alias("__qb"),
        F.col(value_col).cast(decimals).alias("__qv"),
    )
    q_total = q.agg(F.sum(F.abs(F.col("__qv"))).alias("__q_l1"))
    joined = df.join(
        F.broadcast(q), on=[F.col(bucket_col) == F.col("__qb")], how="left"
    )
    per_key = joined.groupBy(*key_cols).agg(
        F.sum(F.abs(a - F.coalesce(F.col("__qv"), F.lit(0).cast(decimals)))).alias(
            "__d_a"
        ),
        F.sum(
            F.when(F.col("__qb").isNotNull(), F.abs(F.col("__qv")))
        ).alias("__matched_q"),
        F.count(F.col("__qb")).alias("n_common"),
    )
    scored = per_key.crossJoin(F.broadcast(q_total)).select(
        *key_cols,
        (
            F.col("__d_a")
            + F.col("__q_l1")
            - F.coalesce(F.col("__matched_q"), F.lit(0).cast(decimals))
        )
        .cast("double")
        .alias("distance"),
        "n_common",
    )
    return scored.orderBy(
        F.col("distance").asc(), *[F.col(c).asc() for c in key_cols]
    ).limit(k)


def series_l1_topk_sql(
    relation: str,
    key_expr: str,
    bucket_expr: str,
    value_expr: str,
    query_relation: str,
    k: int = 10,
    decimals: str = "DECIMAL(18,2)",
) -> str:
    """DuckDB twin of ``series_l1_topk``. ``relation``/``query_relation``
    expose (k/bucket/v)-shaped rows via the given expressions."""
    return f"""
WITH qt AS (
  SELECT sum(abs(CAST({value_expr} AS {decimals}))) AS q_l1
  FROM {query_relation}
),
per_key AS (
  SELECT a.{key_expr} AS k,
         sum(abs(CAST(a.{value_expr} AS {decimals})
                 - coalesce(CAST(q.{value_expr} AS {decimals}),
                            CAST(0 AS {decimals})))) AS d_a,
         sum(CASE WHEN q.{bucket_expr} IS NOT NULL
                  THEN abs(CAST(q.{value_expr} AS {decimals})) END) AS matched_q,
         count(q.{bucket_expr}) AS n_common
  FROM {relation} a LEFT JOIN {query_relation} q
    ON a.{bucket_expr} = q.{bucket_expr}
  GROUP BY 1
)
SELECT k, CAST(d_a + qt.q_l1
               - coalesce(matched_q, CAST(0 AS {decimals})) AS DOUBLE)
         AS distance,
       CAST(n_common AS BIGINT) AS n_common
FROM per_key CROSS JOIN qt
ORDER BY distance ASC, k ASC
LIMIT {int(k)}
"""
