"""mixture_plan: hand-computed allocations, the alpha=1 proportional
identity, zero-inventory drop, share conservation, and the DuckDB
twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(spark, rows, budget, alpha):
    from ml_hadoop_experiment_spark.operators.mixture import mixture_plan

    df = spark.createDataFrame(rows, "source string, n long")
    return {
        r["source"]: r.asDict()
        for r in mixture_plan(
            df, "source", "n", budget=budget, alpha=alpha
        ).collect()
    }


class TestMixturePlan:
    def test_alpha_one_is_proportional(self, spark):
        got = _plan(
            spark, [("a", 300), ("a", 100), ("b", 100)], budget=1000,
            alpha=1.0,
        )
        assert got["a"]["n_tokens"] == 400 and got["b"]["n_tokens"] == 100
        assert got["a"]["alpha_share"] == 0.8
        assert got["b"]["alloc_tokens"] == 200.0
        assert got["a"]["raw_share"] == got["a"]["alpha_share"]

    def test_alpha_smoothing_lifts_the_tail(self, spark):
        """alpha=0.5 on 400-vs-100: shares become 2/3 vs 1/3 (sqrt
        ratio 20:10) — the long-tail source gains over its 0.2 raw
        share."""
        got = _plan(
            spark, [("a", 400), ("b", 100)], budget=300, alpha=0.5
        )
        assert got["a"]["alpha_share"] == round(2 / 3, 6)
        assert got["b"]["alpha_share"] == round(1 / 3, 6)
        assert got["b"]["alpha_share"] > got["b"]["raw_share"]
        # b is granted 100 tokens = its whole inventory: epochs 1.0
        assert got["b"]["epochs"] == 1.0
        assert got["b"]["sample_fraction"] == 1.0
        # a is granted 200 of 400: fraction 0.5
        assert got["a"]["sample_fraction"] == 0.5

    def test_oversampling_flagged_by_epochs(self, spark):
        """A grant above inventory -> epochs > 1 but sample_fraction
        capped at 1 (the source repeats, it cannot downsample)."""
        got = _plan(spark, [("a", 100), ("b", 100)], budget=1000, alpha=1.0)
        assert got["a"]["epochs"] == 5.0
        assert got["a"]["sample_fraction"] == 1.0

    def test_zero_inventory_source_dropped_and_null_weights(self, spark):
        from ml_hadoop_experiment_spark.operators.mixture import mixture_plan

        df = spark.createDataFrame(
            [("a", 100), ("empty", None)], "source string, n long"
        )
        got = {
            r["source"]
            for r in mixture_plan(df, "source", "n", 100).collect()
        }
        assert got == {"a"}

    def test_share_conservation(self, spark, documents):
        from ml_hadoop_experiment_spark.operators.mixture import mixture_plan
        from ml_hadoop_experiment_spark.functions.text import token_count

        plan = mixture_plan(
            documents.withColumn("n_tok", token_count(F.col("text"))),
            "source", "n_tok", budget=100_000, alpha=0.3,
        ).collect()
        assert len(plan) == 20  # src0..src19
        assert abs(sum(r["alpha_share"] for r in plan) - 1.0) < 1e-4
        assert abs(sum(r["alloc_tokens"] for r in plan) - 100_000) < 1.0

    def test_contracts(self, spark):
        from ml_hadoop_experiment_spark.operators.mixture import mixture_plan

        df = spark.createDataFrame([("a", 1)], "source string, n long")
        with pytest.raises(ValueError, match="budget"):
            mixture_plan(df, "source", "n", 0)
        with pytest.raises(ValueError, match="alpha"):
            mixture_plan(df, "source", "n", 10, alpha=0.0)
        with pytest.raises(ValueError, match="alpha"):
            mixture_plan(df, "source", "n", 10, alpha=1.5)

    def test_duckdb_twin(self, spark):
        import duckdb

        from ml_hadoop_experiment_spark.operators.mixture import (
            mixture_plan,
            mixture_plan_sql,
        )

        rows = [("a", 400), ("b", 100), ("c", 7)]
        df = spark.createDataFrame(rows, "source string, n long")
        sp = (
            mixture_plan(df, "source", "n", budget=1234, alpha=0.3)
            .toPandas()
            .sort_values("source")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES"
            " ('a', 400), ('b', 100), ('c', 7)) AS v(source, n)"
        )
        du = (
            con.execute(
                mixture_plan_sql("t", "source", "n", budget=1234, alpha=0.3)
            )
            .df()
            .sort_values("source")
            .reset_index(drop=True)
        )
        assert sp[sorted(sp.columns)].equals(du[sorted(du.columns)])
