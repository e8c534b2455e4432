"""Int8 embedding quantization (operators/quantize.py): encode/decode
round-trips, degenerate dims, exact integer top-k, error audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.operators.quantize import (
    dequantize_expr,
    quantization_error,
    quantization_params,
    quantize_expr,
    quantized_topk,
)


def _vframe(spark, pts):
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "id long, v array<float>")


class TestCodec:
    def test_params_and_extremes(self, spark):
        df = _vframe(spark, [(0, -1), (10, 1), (5, 0)])
        params = quantization_params(df, "v", 2)
        assert params == [(0.0, 10.0), (-1.0, 1.0)]
        codes = {
            r["id"]: list(r["q"])
            for r in df.select(
                "id", quantize_expr(F.col("v"), params).alias("q")
            ).collect()
        }
        # min encodes to -128, max to 127, midpoint to round(127.5)-128
        assert codes[0] == [-128, -128]
        assert codes[1] == [127, 127]
        assert codes[2] == [0, 0]  # round(127.5) = 128 (half-up) - 128

    def test_degenerate_dim_encodes_zero_and_decodes_exact(self, spark):
        df = _vframe(spark, [(3, 1), (3, 2)])  # dim 0 constant
        params = quantization_params(df, "v", 2)
        assert params[0] == (3.0, 3.0)
        out = df.select(
            quantize_expr(F.col("v"), params).alias("q")
        ).select(dequantize_expr(F.col("q"), params).alias("x"))
        for r in out.collect():
            assert r["x"][0] == 3.0

    def test_roundtrip_error_bounded_by_half_step(self, spark):
        df = _vframe(spark, [(0,), (1,), (2.5,), (7.3,), (10,)])
        params = quantization_params(df, "v", 1)
        step = (10.0 - 0.0) / 255
        out = df.select(
            F.col("v")[0].alias("x"),
            dequantize_expr(
                quantize_expr(F.col("v"), params), params
            )[0].alias("xh"),
        )
        for r in out.collect():
            assert abs(r["x"] - r["xh"]) <= step / 2 + 1e-12


class TestTopk:
    def test_exact_neighbor_order_and_self_exclusion(self, spark):
        # query is id 0 = (1, 0); id 1 aligned, id 2 orthogonal, id 3 opposed
        df = _vframe(spark, [(1, 0), (0.9, 0), (0, 1), (-1, 0)])
        out = quantized_topk(df, "id", "v", dim=2, query_id=0, k=3).collect()
        assert [r["id"] for r in out] == [1, 2, 3]
        assert all(r["id"] != 0 for r in out)
        assert out[0]["qdot"] > out[1]["qdot"] > out[2]["qdot"]

    def test_missing_query_raises(self, spark):
        df = _vframe(spark, [(1, 0)])
        with pytest.raises(ValueError, match="expected 1 row"):
            quantized_topk(df, "id", "v", dim=2, query_id=99, k=3)

    def test_scoring_scan_has_no_shuffle(self, spark):
        df = _vframe(spark, [(1, 0), (0, 1), (1, 1)])
        out = quantized_topk(df, "id", "v", dim=2, query_id=0, k=2)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan


class TestError:
    def test_perfect_grid_has_zero_error(self, spark):
        # values exactly on the 255-step grid of [0, 255] reconstruct exactly
        df = _vframe(spark, [(0,), (51,), (255,)])
        row = quantization_error(df, "v", dim=1).collect()[0]
        assert row["n"] == 3
        assert row["mse"] == 0.0

    def test_error_positive_off_grid(self, spark):
        df = _vframe(spark, [(0,), (0.4,), (255,)])
        row = quantization_error(df, "v", dim=1).collect()[0]
        assert row["mse"] > 0
