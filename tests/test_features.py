"""Hashing-trick term features."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.features import hashed_term_features


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


class TestHashedTermFeatures:
    def test_unsigned_counts_are_term_frequencies(self, spark):
        df = _docs(spark, [(1, "a b a"), (2, "b")])
        out = hashed_term_features(
            df, "doc_id", "text", num_features=1 << 20, signed=False
        ).toPandas()
        # a huge feature space -> no collisions for 2 tokens: counts are tfs
        by_doc = out.groupby("id")["value"].sum()
        assert by_doc[1] == 3 and by_doc[2] == 1
        # 'b' must land in the same bucket for both docs
        b1 = out[(out["id"] == 1) & (out["value"] == 1)]["bucket"].iloc[0]
        b2 = out[out["id"] == 2]["bucket"].iloc[0]
        assert b1 == b2

    def test_deterministic_across_runs_and_partitioning(self, spark):
        df = _docs(spark, [(i, f"tok{i} shared words here") for i in range(40)])
        a = hashed_term_features(df.coalesce(1), "doc_id", "text").toPandas()
        b = hashed_term_features(df.repartition(8), "doc_id", "text").toPandas()
        key = ["id", "bucket"]
        pd.testing.assert_frame_equal(
            a.sort_values(key, ignore_index=True),
            b.sort_values(key, ignore_index=True),
        )

    def test_signed_values_bounded_by_tf(self, spark):
        df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(500)))])
        out = hashed_term_features(
            df, "doc_id", "text", num_features=64, signed=True
        ).toPandas()
        # signed collisions can cancel but never exceed the colliding count
        assert out["value"].abs().max() <= 500
        assert (out["bucket"] < 64).all() and (out["bucket"] >= 0).all()

    def test_single_shuffle_plan(self, spark):
        df = _docs(spark, [(1, "a b c")])
        plan = (
            hashed_term_features(df, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") <= 1, plan
