"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (vectorized inference column over
lineitem — the reference's core operator) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented SURVEY.md §2 operator as
(Spark callable, DuckDB oracle SQL) pairs; see the
ml_hadoop_experiment_spark/queries/ package.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ml_hadoop_experiment_spark.queries import ORACLE_SQL, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["udf_linear_score"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
