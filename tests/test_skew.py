"""salted_join: result-invariance vs the plain join + salt mechanics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.skew import salted_join


def _frames(spark):
    # hot key: 'a' carries 80% of the fact rows
    fact = pd.DataFrame(
        {
            "k": ["a"] * 80 + ["b"] * 15 + ["c"] * 5,
            "v": range(100),
        }
    )
    dim = pd.DataFrame({"k": ["a", "b", "d"], "w": [10, 20, 40]})
    return spark.createDataFrame(fact), spark.createDataFrame(dim)


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, spark):
        fact, dim = _frames(spark)
        plain = fact.join(dim, "k").orderBy("v").collect()
        salted = salted_join(fact, dim, ["k"], salt=4).orderBy("v").collect()
        assert [tuple(r) for r in salted] == [tuple(r) for r in plain]

    def test_left_preserves_unmatched_fact_rows(self, spark):
        fact, dim = _frames(spark)
        plain = fact.join(dim, "k", "left").orderBy("v").collect()
        salted = salted_join(fact, dim, ["k"], how="left", salt=4).orderBy("v").collect()
        assert [tuple(r) for r in salted] == [tuple(r) for r in plain]
        # 'c' rows survive with null weight
        assert any(r["k"] == "c" and r["w"] is None for r in salted)

    def test_salt_actually_spreads_the_hot_key(self, spark):
        fact, dim = _frames(spark)
        salted = fact.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), 4).cast("int"),
        )
        n_salts = (
            salted.where(F.col("k") == "a").select("__salt").distinct().count()
        )
        assert n_salts > 1  # the 80-row hot key spans multiple sub-keys

    def test_rejects_right_and_full(self, spark):
        fact, dim = _frames(spark)
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(fact, dim, ["k"], how="right")
        with pytest.raises(ValueError, match="salt must be"):
            salted_join(fact, dim, ["k"], salt=1)
