"""Declared queries: each SURVEY.md §2 operator as a (Spark, oracle-SQL) pair.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching entry in ``ORACLE_SQL`` is ANSI SQL DuckDB executes over the same
parquet tables. Column names are aligned on both sides because the driver's
compare hashes values after sorting columns by name.

Determinism rules used throughout (SURVEY.md §7 "what's hard"):
- randomness -> portable multiplicative / md5 hashes (functions/hashing.py),
  bit-identical in Spark and DuckDB;
- double SUM/AVG -> per-row CAST to DECIMAL before aggregating (exact,
  order-independent), final CAST back to DOUBLE (deterministic);
- no timestamps in outputs (comparison semantics differ across drivers).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.functions.hashing import (
    portable_unit_hash_sql,
)
from ml_hadoop_experiment_spark.operators.inference import with_inference_column
from ml_hadoop_experiment_spark.operators.sampling import sample_with_predicate
from ml_hadoop_experiment_spark.operators.vocabulary import vocabulary_dataframe


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# U1/U5/U6 substrate: vectorized inference column with a deterministic,
# SQL-expressible "model" (the reference's own test trick — Add/Multiply
# models, tests/tensorflow/test_dataframe_prediction_helper.py:30-83).
# --------------------------------------------------------------------------


class _LinearScorer:
    """score = price * (1 - discount); stands in for a real model."""

    def predict(self, price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)


def q_udf_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    scored = with_inference_column(
        li,
        _LinearScorer(),
        ["l_extendedprice", "l_discount"],
        lambda m, b: m.predict(b[0], b[1]),
        output_type="double",
        batch_size=4096,
        output_col="score",
    )
    return scored.select("l_orderkey", "l_linenumber", "score")


SQL_UDF_LINEAR_SCORE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS score
FROM lineitem
"""


# --------------------------------------------------------------------------
# R2/R3 + P3/P4/P5: stratified sampling with portable deterministic hash.
# --------------------------------------------------------------------------

def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sampled = sample_with_predicate(
        li,
        global_sampling=1.0,
        positive_sampling=0.5,
        negative_sampling=0.25,
        positive_predicate=F.col("l_returnflag") == "R",
        columns_for_sample=["l_orderkey"],
        portable=True,
        seed=7,
    )
    return sampled.select("l_orderkey", "l_linenumber", "l_returnflag", "weight")


SQL_SAMPLE_STRATIFIED = f"""
WITH h AS (
  SELECT *, {portable_unit_hash_sql('l_orderkey', salt=7)} AS sh FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 2.0 END AS weight
FROM h
WHERE (l_returnflag = 'R' AND sh < 0.5)
   OR (l_returnflag <> 'R' AND sh < 0.25)
"""


# --------------------------------------------------------------------------
# A1: vocabulary build (distinct + count + threshold), scalar columns.
# --------------------------------------------------------------------------

def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return vocabulary_dataframe(part, ["p_brand", "p_type"], threshold=5)


SQL_VOCAB_BUILD = """
SELECT key, value, count(*) AS count
FROM (
  SELECT 'p_brand' AS key, p_brand AS value FROM part WHERE p_brand IS NOT NULL
  UNION ALL
  SELECT 'p_type' AS key, p_type AS value FROM part WHERE p_type IS NOT NULL
)
GROUP BY key, value
HAVING count(*) >= 5
"""


# --------------------------------------------------------------------------
# A2: many-to-one key merge of several source columns into one vocab key.
# --------------------------------------------------------------------------

def q_vocab_merged_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return vocabulary_dataframe(
        part, {"brand_or_type": ["p_brand", "p_type"], "psize": ["p_size"]}, threshold=2
    )


SQL_VOCAB_MERGED_KEYS = """
SELECT key, value, count(*) AS count
FROM (
  SELECT 'brand_or_type' AS key, p_brand AS value FROM part WHERE p_brand IS NOT NULL
  UNION ALL
  SELECT 'brand_or_type' AS key, p_type AS value FROM part WHERE p_type IS NOT NULL
  UNION ALL
  SELECT 'psize' AS key, CAST(p_size AS VARCHAR) AS value FROM part WHERE p_size IS NOT NULL
)
GROUP BY key, value
HAVING count(*) >= 2
"""


# --------------------------------------------------------------------------
# A1 (array cells): vocabulary over an exploded token column — the
# reference's list-column fan-out (vocabulary.py:26-29).
# --------------------------------------------------------------------------

def q_vocab_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "tokens", F.split(F.col("text"), " ")
    )
    return vocabulary_dataframe(docs, ["tokens"], threshold=50)


SQL_VOCAB_TOKENS = """
SELECT 'tokens' AS key, value, count(*) AS count
FROM (SELECT unnest(string_split(text, ' ')) AS value FROM documents)
WHERE value IS NOT NULL
GROUP BY value
HAVING count(*) >= 50
"""


# --------------------------------------------------------------------------
# U12 relational form: sparse COO via posexplode (SURVEY §2.8 — indices are
# (row, pos), values are elements; dense_shape derivable via max(size)).
# --------------------------------------------------------------------------

def q_sparse_coo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "value"),
    )


SQL_SPARSE_COO = """
SELECT doc_id,
       unnest(range(len(string_split(text, ' ')))) AS pos,
       unnest(string_split(text, ' ')) AS value
FROM documents
"""


# --------------------------------------------------------------------------
# P6/P8: null-default coalesce + cast and null-if expressions.
# --------------------------------------------------------------------------

def q_null_default_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("click")), F.lit("none")).alias(
            "filled_type"
        ),
        F.coalesce(
            F.when(F.col("value") > 5.0, F.col("value")), F.lit(0.0)
        ).alias("filled_value"),
    )


SQL_NULL_DEFAULT_FILL = """
SELECT event_id,
       coalesce(nullif(event_type, 'click'), 'none') AS filled_type,
       coalesce(CASE WHEN value > 5.0 THEN value END, 0.0) AS filled_value
FROM events
"""


# --------------------------------------------------------------------------
# S7/A6: metric extraction to long format (step, name, value).
# --------------------------------------------------------------------------

def q_events_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("value").isNotNull())
        .select(
            F.col("event_id").alias("step"),
            F.col("event_type").alias("name"),
            F.col("value"),
        )
    )


SQL_EVENTS_LONG = """
SELECT event_id AS step, event_type AS name, value
FROM events
WHERE value IS NOT NULL
"""


# --------------------------------------------------------------------------
# Pipeline exercises over the TPC-H-ish fixtures (SURVEY §2.3: joins come
# free from Spark; declared queries use them to exercise the engine).
# Decimal-cast per row before SUM for cross-engine exactness.
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    out = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("d_sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("d_sum_base"),
            F.sum(disc_price).alias("d_sum_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("d_sum_qty").cast("double").alias("sum_qty"),
        F.col("d_sum_base").cast("double").alias("sum_base_price"),
        F.col("d_sum_disc").cast("double").alias("sum_disc_price"),
        (F.col("d_sum_qty").cast("double") / F.col("count_order")).alias("avg_qty"),
        "count_order",
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join pipeline: customer ⋈ orders ⋈ lineitem.

    The customer side is small → broadcast hint; lineitem⋈orders is the big
    shuffle join Catalyst plans (sort-merge / AQE-skew-aware at scale).
    """
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(revenue).alias("d_rev"), F.count(F.lit(1)).alias("n_lines"))
    )
    return joined.select(
        "o_orderkey", F.col("d_rev").cast("double").alias("revenue"), "n_lines"
    )


SQL_SEGMENT_REVENUE = """
SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
"""


QUERIES = {
    "udf_linear_score": q_udf_linear_score,
    "sample_stratified": q_sample_stratified,
    "vocab_build": q_vocab_build,
    "vocab_merged_keys": q_vocab_merged_keys,
    "vocab_tokens": q_vocab_tokens,
    "sparse_coo": q_sparse_coo,
    "null_default_fill": q_null_default_fill,
    "events_long": q_events_long,
    "pricing_summary": q_pricing_summary,
    "segment_revenue": q_segment_revenue,
}

ORACLE_SQL = {
    "udf_linear_score": SQL_UDF_LINEAR_SCORE,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "vocab_build": SQL_VOCAB_BUILD,
    "vocab_merged_keys": SQL_VOCAB_MERGED_KEYS,
    "vocab_tokens": SQL_VOCAB_TOKENS,
    "sparse_coo": SQL_SPARSE_COO,
    "null_default_fill": SQL_NULL_DEFAULT_FILL,
    "events_long": SQL_EVENTS_LONG,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "segment_revenue": SQL_SEGMENT_REVENUE,
}
