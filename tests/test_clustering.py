"""Deterministic Lloyd k-means (operators/clustering.py): init,
assignment tie-breaks, centroid quantization, empty-cluster carry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.clustering import (
    kmeans_assign_expr,
    kmeans_lloyd,
)


def _vframe(spark, pts):
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "id long, v array<float>")


class TestKmeansLloyd:
    def test_two_obvious_clusters(self, spark):
        df = _vframe(spark, [(0, 0), (10, 10), (0.5, 0.5), (9.5, 9.5)])
        assigned, cents = kmeans_lloyd(df, "id", "v", dim=2, k=2, iters=2)
        got = {r["id"]: r["cluster"] for r in assigned.collect()}
        assert got == {0: 0, 2: 0, 1: 1, 3: 1}
        assert cents == [[0.25, 0.25], [9.75, 9.75]]

    def test_zero_iters_assigns_under_init(self, spark):
        # iters=0: centroids stay the k smallest-id vectors
        df = _vframe(spark, [(0, 0), (4, 0), (3, 0)])
        assigned, cents = kmeans_lloyd(df, "id", "v", dim=2, k=2, iters=0)
        assert cents == [[0.0, 0.0], [4.0, 0.0]]
        got = {r["id"]: r["cluster"] for r in assigned.collect()}
        assert got == {0: 0, 1: 1, 2: 1}

    def test_empty_cluster_keeps_previous_centroid(self, spark):
        # duplicate init vectors: every point ties to index 0, so
        # cluster 1 goes empty and must carry its previous centroid
        df = _vframe(spark, [(0, 0), (0, 0), (5, 0)])
        assigned, cents = kmeans_lloyd(df, "id", "v", dim=2, k=2, iters=1)
        assert cents[1] == [0.0, 0.0]
        assert cents[0] == [pytest.approx(5 / 3, abs=1e-6), 0.0]
        assert {r["cluster"] for r in assigned.collect()} <= {0, 1}

    def test_centroid_update_is_rounded(self, spark):
        # mean 1/3 must come back quantized to round_digits
        df = _vframe(spark, [(0, 0), (0, 0), (1, 0)])
        _, cents = kmeans_lloyd(df, "id", "v", dim=2, k=1, iters=1)
        assert cents == [[0.333333, 0.0]]

    def test_validation(self, spark):
        df = _vframe(spark, [(0, 0)])
        with pytest.raises(ValueError, match="k="):
            kmeans_lloyd(df, "id", "v", dim=2, k=2, iters=1)
        with pytest.raises(ValueError, match="k >= 1"):
            kmeans_lloyd(df, "id", "v", dim=2, k=0, iters=1)


class TestAssignExpr:
    def test_tie_breaks_to_smaller_index(self, spark):
        df = _vframe(spark, [(1, 0)])  # equidistant from both centroids
        out = df.select(
            kmeans_assign_expr(F.col("v"), [[0.0, 0.0], [2.0, 0.0]]).alias("c")
        ).collect()
        assert out[0]["c"] == 0

    def test_assignment_is_map_only(self, spark):
        # the per-iteration scan must not shuffle for assignment
        df = _vframe(spark, [(0, 0), (1, 1)])
        out = df.select(
            kmeans_assign_expr(F.col("v"), [[0.0, 0.0], [1.0, 1.0]]).alias("c")
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
