"""Z-order layout: Morton math, clustered writes, measured data skipping."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ml_hadoop_experiment_spark.plans.layout import (
    file_stats,
    interleave_bits,
    quantize,
    skipping_fraction,
    write_zordered,
    zorder_value,
)


def _morton2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


class TestZValue:
    def test_matches_reference_morton(self, spark):
        rng = np.random.default_rng(3)
        xs = rng.integers(0, 1 << 16, 64)
        ys = rng.integers(0, 1 << 16, 64)
        df = spark.createDataFrame(
            pd.DataFrame({"x": xs, "y": ys})
        ).withColumn(
            "z",
            interleave_bits([F.col("x"), F.col("y")], bits=16),
        )
        got = df.toPandas()
        for _, r in got.iterrows():
            assert r["z"] == _morton2(int(r["x"]), int(r["y"]), 16)

    def test_quantize_clamps_and_grids(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"v": [-5.0, 0.0, 50.0, 100.0, 400.0]})
        ).select(quantize(F.col("v"), 0.0, 100.0, 8).alias("q"))
        qs = [r["q"] for r in df.collect()]
        assert qs[0] == 0 and qs[1] == 0
        assert qs[3] == 255 and qs[4] == 255
        assert 0 < qs[2] < 255

    def test_locality(self, spark):
        """Points close in both dims are close on the curve; the curve key
        orders the quadrants hierarchically."""
        pdf = pd.DataFrame({"x": [0, 1, 65535], "y": [0, 1, 65535]})
        zs = (
            spark.createDataFrame(pdf)
            .select(
                zorder_value(
                    [(F.col("x"), 0, 65535), (F.col("y"), 0, 65535)], bits=16
                ).alias("z")
            )
            .toPandas()["z"]
            .tolist()
        )
        assert zs[0] < zs[1] < zs[2]
        assert zs[2] == (1 << 32) - 1


class TestZorderedWrite:
    @pytest.fixture(scope="class")
    def paths(self, spark):
        rng = np.random.default_rng(11)
        n = 40_000
        pdf = pd.DataFrame(
            {
                "a": rng.integers(0, 10_000, n),
                "b": rng.integers(0, 10_000, n),
                "payload": rng.normal(size=n),
            }
        )
        df = spark.createDataFrame(pdf)
        zdir, pdir = tempfile.mkdtemp(), tempfile.mkdtemp()
        write_zordered(
            df,
            zdir,
            [(F.col("a"), 0, 10_000), (F.col("b"), 0, 10_000)],
            bits=16,
            num_files=16,
        )
        # the unclustered comparison: same file count, no meaningful order
        df.repartition(16).write.mode("overwrite").parquet(pdir)
        yield zdir, pdir
        shutil.rmtree(zdir, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)

    def test_skipping_beats_unclustered_on_both_dims(self, paths):
        zdir, pdir = paths
        zs = file_stats(zdir, ["a", "b"])
        ps = file_stats(pdir, ["a", "b"])
        assert len(zs) == 16
        # a narrow range predicate on EITHER dimension skips a majority of
        # z-clustered files and (with overwhelming probability) zero
        # random-partitioned files
        for col in ("a", "b"):
            z_skip = skipping_fraction(zs, col, 1000.0, 1500.0)
            p_skip = skipping_fraction(ps, col, 1000.0, 1500.0)
            assert z_skip >= 0.5, (col, z_skip, zs)
            assert z_skip > p_skip, (col, z_skip, p_skip)

    def test_roundtrip_content(self, spark, paths):
        zdir, _ = paths
        back = spark.read.parquet(zdir)
        assert back.count() == 40_000
        assert set(back.columns) == {"a", "b", "payload"}
