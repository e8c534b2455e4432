"""Semantic benchmark decontamination (operators/semdecon.py):
corpus-vs-benchmark max-cosine semantics, NULL/zero-vector handling,
and bucket-confined candidate generation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


class TestCosineDecontaminate:
    def test_max_cosine_and_flag(self, spark):
        from ml_hadoop_experiment_spark.operators.semdecon import (
            cosine_decontaminate,
        )

        dim = 4
        e = [0.0] * 4
        # benchmark: unit x-axis; corpus: exact copy (cos 1), orthogonal
        # (cos 0 -> same bucket? depends on planes; verify via result),
        # antiparallel (different half-space bucket -> no match)
        bench = _vecs(spark, [(0, [1.0, 0.0, 0.0, 0.0])])
        corpus = _vecs(
            spark,
            [
                (1, [2.0, 0.0, 0.0, 0.0]),     # cos 1.0
                (2, [1.0, 1.0, 0.0, 0.0]),     # cos ~0.707107
                (3, [-1.0, 0.0, 0.0, 0.0]),    # cos -1 (other bucket)
            ],
        )
        out = {
            r["id"]: (r["max_score"], r["contaminated"])
            for r in cosine_decontaminate(
                corpus, bench, num_planes=2, dim=dim, threshold=0.9
            ).collect()
        }
        assert out[1] == (1.0, True)
        got = out[2][0]
        if got is not None:  # same bucket as bench under these planes
            assert got == pytest.approx(round(1 / math.sqrt(2), 6))
            assert out[2][1] is False
        # antiparallel vector lands in the opposite sign bucket: no
        # candidate, NULL score, not contaminated
        assert out[3] == (None, False)

    def test_zero_vectors_never_match(self, spark):
        from ml_hadoop_experiment_spark.operators.semdecon import (
            cosine_decontaminate,
        )

        bench = _vecs(spark, [(0, [0.0, 0.0, 0.0, 0.0])])
        corpus = _vecs(
            spark,
            [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        )
        out = {
            r["id"]: (r["max_score"], r["contaminated"])
            for r in cosine_decontaminate(
                corpus, bench, num_planes=2, dim=4, threshold=0.1
            ).collect()
        }
        # zero benchmark vector gives no valid cosine to anyone; zero
        # corpus vector has none either
        assert out == {1: (None, False), 2: (None, False)}

    def test_every_corpus_row_reported_once(self, spark):
        from ml_hadoop_experiment_spark.operators.semdecon import (
            cosine_decontaminate,
        )

        emb = _vecs(
            spark,
            [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(4)])
             for i in range(40)],
        )
        corpus = emb.where(F.col("vec_id") % 4 != 0)
        bench = emb.where(F.col("vec_id") % 4 == 0)
        rows = cosine_decontaminate(
            corpus, bench, num_planes=3, dim=4, threshold=0.5
        ).collect()
        assert sorted(r["id"] for r in rows) == sorted(
            r["vec_id"] for r in corpus.collect()
        )
