"""plans/optimize utilities: salted join equivalence, fan_out guard,
partition diagnostics."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.plans.optimize import (
    fan_out,
    partition_sizes,
    salted_join,
    wholestage_codegen_spans,
)


def test_salted_join_matches_plain_join(spark):
    """Salting must be invisible in the result: same rows as a plain
    equi-join, even with a heavily skewed key."""
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(500)] + [(2, "rare")], "k int, lv string"
    )
    right = spark.createDataFrame([(1, "one"), (2, "two"), (3, "three")], "k int, rv string")

    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", salt=4).select("k", "lv", "rv")

    assert salted.count() == plain.count() == 501
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (9, "no-match")], "k int, lv string")
    right = spark.createDataFrame([(1, "one")], "k int, rv string")
    out = salted_join(left, right, "k", salt=3, how="left").collect()
    by_key = {r["k"]: r["rv"] for r in out}
    assert by_key == {1: "one", 9: None}


def test_fan_out_guard(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert fan_out(wide) is wide  # already wide -> no-op, same object
    assert fan_out(df, min_partitions=1) is df
    assert wide.count() == 1000


def test_partition_sizes(spark):
    df = spark.range(100).repartition(4)
    sizes = partition_sizes(df)
    assert sum(n for _, n in sizes) == 100
    assert len(sizes) <= 4


def test_codegen_span_counter(spark):
    df = spark.range(100).select((F.col("id") * 2).alias("x")).filter("x > 10")
    assert wholestage_codegen_spans(df) >= 1
